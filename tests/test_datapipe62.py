"""Wave-65 gates: the S13/S14/S16/S18/S19 batch twins (datapipe62).

The streaming originals keep their choreographed tests in
test_streaming.py; here each twin is pinned against either the LIVE
streaming job over the same events table (the strongest possible
equivalence) or a pure-Python reference of the algebra it encodes.
Oracle parity runs in the standing battery (test_oracle_parity).
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES
from cassowary_spark.streaming import jobs
from cassowary_spark.tables import load_table

registry.load_all()


def _drain(spark, df, name, output_mode="append"):
    q = jobs.run_to_memory(df, name, output_mode)
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def _stage(stream_dir, frames):
    """Land frames as mtime-ordered parquet files (micro-batch order)."""
    for i, b in enumerate(frames):
        b.coalesce(1).write.parquet(f"{stream_dir}/b{i}")
    os.makedirs(f"{stream_dir}/in", exist_ok=True)
    for i in range(len(frames)):
        src = next(
            f
            for f in os.listdir(f"{stream_dir}/b{i}")
            if f.endswith(".parquet")
        )
        dst = f"{stream_dir}/in/batch{i}.parquet"
        os.rename(f"{stream_dir}/b{i}/{src}", dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    return f"{stream_dir}/in"


_SENTINEL_UID = 10**9


def test_stream_join_full_twin_equals_streaming(spark, sf_dir, tmp_path):
    """The batch twin's (view_id, click_id) multiset == the streaming
    full-outer join's emissions once a sentinel batch pushes the
    watermark past every real window (real events in 2 striped
    batches, so matches and orphans both cross batch boundaries)."""
    ev = load_table(spark, sf_dir, "events")
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    # sentinel: a lone far-future click (matches nothing; its own
    # window never closes, so it is never emitted either)
    far = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 10 DAYS")).alias("t")
    ).collect()[0]["t"]
    # TWO sentinel batches, each carrying BOTH a far-future view and a
    # far-future click on distinct users: the join watermarks each
    # side AFTER its event-type filter, and the global watermark is
    # the MIN of the two nodes — a click-only sentinel would leave the
    # VIEW-side watermark (and so every late orphan view) frozen. Two
    # batches because a batch's max event time only becomes the
    # watermark applied in the NEXT batch.
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )

    def sent(i):
        return spark.createDataFrame(
            [
                (10**12 + 2 * i, far, _SENTINEL_UID + 2 * i, "view", 0.0, "{}"),
                (
                    10**12 + 2 * i + 1,
                    far,
                    _SENTINEL_UID + 2 * i + 1,
                    "click",
                    0.0,
                    "{}",
                ),
            ],
            schema,
        )

    src = _stage(str(tmp_path / "full_twin"), [b1, b2, sent(0), sent(1)])
    got = (
        _drain(
            spark,
            jobs.view_click_join_full(
                jobs.read_events_stream(spark, src),
                watermark="1 hour",
                within="30 minutes",
            ),
            "t_full_twin",
        )
        .filter(
            (F.col("user_id").isNull())
            | (F.col("user_id") < _SENTINEL_UID)
        )
        .collect()
    )
    want = QUERIES["q_stream_join_full"](spark, sf_dir).collect()
    def key(r):  # None-safe sort key (orphan sides are NULL)
        return (
            -1 if r.view_id is None else r.view_id,
            -1 if r.click_id is None else r.click_id,
        )

    assert sorted(map(key, got)) == sorted(map(key, want))


def test_stream_join_semi_twin_equals_streaming(spark, sf_dir, tmp_path):
    """Semi twin == streaming left-semi emissions (no watermark push
    needed: matched views emit on match; unmatched never emit)."""
    ev = load_table(spark, sf_dir, "events")
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    src = _stage(str(tmp_path / "semi_twin"), [b1, b2])
    got = _drain(
        spark,
        jobs.view_click_join_semi(
            jobs.read_events_stream(spark, src),
            watermark="1 hour",
            within="30 minutes",
        ),
        "t_semi_twin",
    ).collect()
    want = QUERIES["q_stream_join_semi"](spark, sf_dir).collect()
    assert sorted(r.view_id for r in got) == sorted(
        r.view_id for r in want
    )
    # at-most-once per view, by construction of the join type
    ids = [r.view_id for r in got]
    assert len(ids) == len(set(ids))


def test_resumable_ingest_audit_invariants(spark, sf_dir):
    """Exactly-once reconciliation: only the crash batch shows a
    redelivery delta, every batch's sink count equals its id count,
    and sink totals equal the table (nothing lost, nothing doubled)."""
    from cassowary_spark.queries.datapipe62 import (
        _INGEST_BATCHES,
        _INGEST_CRASH_AFTER,
    )

    rows = {
        r.batch_id: r
        for r in QUERIES["q_resumable_ingest_audit"](spark, sf_dir).collect()
    }
    assert sorted(rows) == list(range(_INGEST_BATCHES))
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_sink for r in rows.values()) == total
    for b, r in rows.items():
        if b == _INGEST_CRASH_AFTER:
            assert r.n_deduped == r.n_sink  # one full redelivery absorbed
            assert r.n_arrivals == 2 * r.n_sink
        else:
            assert r.n_deduped == 0
            assert r.n_arrivals == r.n_sink


def test_cdc_merge_batch_matches_sequential_fold(spark, sf_dir):
    """Latest-wins is fold-order-invariant: applying the synthesized
    change stream micro-batch by micro-batch (batch = event_id % 4,
    ascending — the streaming apply order) yields the same surviving
    sink as the twin's one-shot resolution, including DELETE wins."""
    from cassowary_spark.queries.datapipe62 import _CDC_DELETE_MOD

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "value")
        .collect()
    )
    sink: dict[int, tuple[int, str, float]] = {}
    for b in range(4):  # sequential micro-batch apply
        for r in ev:
            if r.event_id % 4 != b:
                continue
            op = "D" if r.event_id % _CDC_DELETE_MOD == 0 else "U"
            cur = sink.get(r.user_id)
            if cur is None or r.event_id > cur[0]:
                sink[r.user_id] = (r.event_id, op, r.value)
    want = {
        pk: (seq, math.floor(val * 10**4 + 0.5) / 10**4)
        for pk, (seq, op, val) in sink.items()
        if op != "D"
    }
    got = {
        r.pk: (r.last_seq, r.last_value)
        for r in QUERIES["q_cdc_merge_batch"](spark, sf_dir).collect()
    }
    assert got == want
    # version depth covers every change, surviving or not
    n_versions = {
        r.pk: r.n_versions
        for r in QUERIES["q_cdc_merge_batch"](spark, sf_dir).collect()
    }
    from collections import Counter

    all_versions = Counter(r.user_id for r in ev)
    for pk, n in n_versions.items():
        assert n == all_versions[pk]


def test_observed_metrics_totals(spark, sf_dir):
    """Per-batch observed metrics sum to the whole table: the free
    accumulator contract (observe() rides the write's own scan) the
    streaming pytest proves per batch, pinned here on totals."""
    rows = QUERIES["q_observed_metrics"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    assert sum(r.n_rows for r in rows) == total
    assert sorted(r.batch_id for r in rows) == [0, 1, 2, 3]
    whole = ev.agg(F.sum("value")).collect()[0][0]
    assert abs(sum(r.sum_value for r in rows) - whole) < 1e-2
    for r in rows:
        assert 0 < r.n_users <= 150 and r.n_rows > 0
