"""Wave-71 gates: the S10/S11/S12/S17 batch twins (datapipe68).

The streaming originals keep their choreographed tests in
test_streaming.py; here each twin is pinned against a pure-Python /
pandas reference of the algebra it encodes (independent derivation,
not the twin's own plan). Oracle parity runs in the standing battery
(test_oracle_parity).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES
from cassowary_spark.tables import load_table

registry.load_all()


def test_stream_dedup_wm_planted_accounting(spark, sf_dir):
    """The planted retry layout fixes the expected release exactly:
    every id keeps its first arrival; only ODD ids (retry at +45 min
    > the 30-min delay) re-emit; even-id retries (+10 min) are
    suppressed."""
    ev = load_table(spark, sf_dir, "events")
    exp = {
        (r.event_type): (r.n_ids, r.n_odd)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_ids"),
            F.sum((F.col("event_id") % 2).cast("long")).alias("n_odd"),
        )
        .collect()
    }
    got = QUERIES["q_stream_dedup_wm"](spark, sf_dir).collect()
    assert {r.event_type for r in got} == set(exp)
    for r in got:
        n_ids, n_odd = exp[r.event_type]
        assert r.n_ids == n_ids
        assert r.n_reemitted == n_odd
        assert r.n_kept == n_ids + n_odd


def test_stream_running_totals_matches_pandas(spark, sf_dir):
    """Twin totals == an independent pandas fold over the raw rows."""
    ev = load_table(spark, sf_dir, "events")
    pdf = ev.select("user_id", "value").toPandas()
    ref = pdf.groupby("user_id")["value"].agg(["count", "sum"])
    got = QUERIES["q_stream_running_totals"](spark, sf_dir).collect()
    assert len(got) == len(ref)
    for r in got:
        assert r.n_events == int(ref.loc[r.user_id, "count"])
        want = math.floor(ref.loc[r.user_id, "sum"] * 1e4 + 0.5) / 1e4
        assert abs(r.sum_value - want) < 1e-9


def test_stream_dynamic_sessions_matches_lag_rule(spark, sf_dir):
    """The session_window call must equal the closed-form lag rule
    (new session iff ts - prev >= gap; end = last ts + gap) computed
    independently in Python over the collected rows — the derivation
    the DuckDB oracle uses."""
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select("user_id", "event_type", "ts").collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r.user_id, r.event_type), []).append(r.ts)
    expected = set()
    for (uid, etype), tss in by_key.items():
        gap_s = 300 if etype == "error" else 1800
        tss.sort()
        start, last, n = tss[0], tss[0], 1
        for t in tss[1:]:
            if (t - last).total_seconds() >= gap_s:
                expected.add((start, last, uid, etype, n))
                start, n = t, 0
            last = t
            n += 1
        expected.add((start, last, uid, etype, n))
    got = QUERIES["q_stream_dynamic_sessions"](spark, sf_dir).collect()
    got_set = set()
    for r in got:
        gap_s = 300 if r.event_type == "error" else 1800
        # recover last-ts from session_end = last + gap
        import datetime

        last = r.session_end - datetime.timedelta(seconds=gap_s)
        got_set.add(
            (r.session_start, last, r.user_id, r.event_type, r.n_events)
        )
    assert got_set == expected


def test_stream_dp_release_matches_python_staircase(spark, sf_dir):
    """Noise == the pure-Python inverse-CDF staircase on the md5 u32
    of the event type; dp_n == true count + that noise."""
    from cassowary_spark.queries.datapipe32 import _DP_K, _DP_TS

    ev = load_table(spark, sf_dir, "events")
    true = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    got = QUERIES["q_stream_dp_release"](spark, sf_dir).collect()
    assert {r.event_type for r in got} == set(true)
    for r in got:
        u32 = int(hashlib.md5(r.event_type.encode()).hexdigest()[:8], 16)
        noise = -_DP_K + sum(1 for t in _DP_TS if u32 >= t)
        assert r.noise == noise
        assert r.dp_n == true[r.event_type] + noise
