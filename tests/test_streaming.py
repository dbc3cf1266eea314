"""Structured Streaming tests (SURVEY.md §2 S1–S6): replay the events
parquet as a multi-file stream and assert batch/stream equivalence.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cassowary_spark.streaming import jobs
from cassowary_spark.tables import load_table


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Events split into 4 parquet files so maxFilesPerTrigger=1 yields
    a genuine multi-batch stream (state must merge across batches)."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def _drain(spark, df, name, output_mode="append"):
    q = jobs.run_to_memory(df, name, output_mode)
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def _stage_batches(stream_dir, frames):
    """Land each DataFrame as one parquet file under
    ``<stream_dir>/in``, mtime-pinned in list order — the file source
    replays in modification-time order, so this IS the micro-batch
    choreography the stream-stream tests depend on."""
    import os

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
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return f"{stream_dir}/in"


def test_stream_tumbling_equals_batch(spark, sf_dir, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    # complete mode + huge watermark: the random 4-way split makes
    # "late" arrivals normal, and append would hold back open windows.
    got = _drain(spark, jobs.tumbling_counts(stream, watermark="100 days"), "t_tumbling", "complete").collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
        .collect()
    )
    key = lambda r: (r.window_start, r.event_type)
    got_map = {key(r): (r.n_events, round(r.sum_value, 6)) for r in got}
    batch_map = {key(r): (r.n_events, round(r.sum_value, 6)) for r in batch}
    assert got_map == batch_map


def test_stream_sliding_equals_batch(spark, sf_dir, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _drain(spark, jobs.sliding_counts(stream, watermark="100 days"), "t_sliding", "complete").collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .collect()
    )
    assert {(r.window_start, r.n_events) for r in got} == {
        (r.window_start, r.n_events) for r in batch
    }


def test_stream_session_equals_batch(spark, sf_dir, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _drain(spark, jobs.session_counts(stream, watermark="100 days"), "t_session", "complete").collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .collect()
    )
    k = lambda r: (r.user_id, r.session_start, r.session_end, r.n_events)
    assert {k(r) for r in got} == {k(r) for r in batch}


def test_stream_dedup(spark, sf_dir, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    # wide watermark: the random split reorders time, and rows behind
    # the watermark are (correctly) treated as late and dropped.
    got = _drain(spark, jobs.dedup_events(stream, watermark="100 days"), "t_dedup")
    n_unique = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_static_join(spark, sf_dir, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    cust = load_table(spark, sf_dir, "customer")
    got = _drain(spark, jobs.enrich_with_customers(stream, cust), "t_join")
    ev = load_table(spark, sf_dir, "events")
    expected = ev.join(cust, ev.user_id == cust.c_custkey).count()
    assert got.count() == expected


def test_watermark_drops_late_data(spark, tmp_path):
    """S4: with watermark W, a row older than max(ts)-W arriving in a
    LATER batch is dropped from the aggregation."""
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    batch1 = [(1, base + dt.timedelta(hours=3), 1, "click", 1.0, "{}")]
    # 3h late vs the max ts seen, watermark is 1h -> must be dropped
    batch2 = [(2, base, 1, "click", 1.0, "{}")]
    d1, d2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    for rows, d in ((batch1, d1), (batch2, d2)):
        spark.createDataFrame(rows, jobs.EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
    # Two-phase arrival via checkpoint restart: run the query to
    # completion on file 1 (watermark advances to max(ts)-1h and is
    # persisted), then drop file 2 in and resume from the checkpoint —
    # the late row is now behind the recovered watermark.
    import shutil, glob, os

    stream_dir = str(tmp_path / "stream")
    cp = str(tmp_path / "cp")
    os.makedirs(stream_dir)
    collected = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    def run_once():
        stream = jobs.read_events_stream(spark, stream_dir, max_files_per_trigger=1)
        q = (
            jobs.tumbling_counts(stream, watermark="1 hour")
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    shutil.copy(glob.glob(f"{d1}/part-*.parquet")[0], f"{stream_dir}/0001.parquet")
    run_once()
    shutil.copy(glob.glob(f"{d2}/part-*.parquet")[0], f"{stream_dir}/0002.parquet")
    run_once()
    # the on-time event produced one update; the late event none
    assert sum(r.n_events for r in collected) == 1, collected


def test_stream_capped_sessions_equals_batch(spark, sf_dir, tmp_path_factory):
    """S7: applyInPandasWithState state machine vs its batch twin.

    Files are time-range partitioned and written in ts order so each
    user's events arrive ordered across micro-batches (the Kafka
    key-ordering contract); a far-future sentinel event advances the
    watermark at the end so every idle session times out and emits.
    """
    import datetime as dt

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    path = str(tmp_path_factory.mktemp("events_capped"))
    # 4 time-ordered files with increasing mtimes (arrival order)
    bounds = [r[0] for r in ev.selectExpr(
        "percentile_approx(ts, array(0.25, 0.5, 0.75), 10000)").collect()][0]
    import time as _t
    lo = None
    for i, hi in enumerate(list(bounds) + [None]):
        part = ev
        if lo is not None:
            part = part.filter(F.col("ts") > lo)
        if hi is not None:
            part = part.filter(F.col("ts") <= hi)
        part.orderBy("ts").coalesce(1).write.mode("append").parquet(path)
        lo = hi
        _t.sleep(1.1)  # distinct mtimes → FileStreamSource replays in order
    sentinel = spark.createDataFrame(
        [(-1, dt.datetime(2100, 1, 1), 0.0)], "user_id long, ts timestamp, value double"
    )
    sentinel.coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    got = _drain(
        spark, jobs.value_capped_sessions(stream, gap_minutes=30, cap=200.0), "t_capped"
    ).filter("user_id >= 0").collect()
    batch = jobs.value_capped_sessions_batch(ev, gap_minutes=30, cap=200.0).collect()
    k = lambda r: (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
    assert {k(r) for r in got} == {k(r) for r in batch}
    assert len(got) > 0


def test_stream_stream_join_equals_batch(spark, sf_dir, events_stream_dir):
    """Stream-stream interval join: same pairs as the batch twin.

    Inner joins emit on match, so a huge watermark only delays state
    CLEANUP, never results — every pair must appear once both sides'
    files are processed.
    """
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _drain(
        spark,
        jobs.view_click_join(stream, watermark="100 days"),
        "t_ssjoin",
    ).collect()
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").alias("v")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    batch = v.join(
        c,
        F.expr(
            "v.user_id = c.user_id AND c.ts >= v.ts"
            " AND c.ts <= v.ts + INTERVAL 30 MINUTES"
        ),
    ).select(
        F.col("v.event_id").alias("view_id"), F.col("c.event_id").alias("click_id")
    ).collect()
    assert {(r.view_id, r.click_id) for r in got} == {
        (r.view_id, r.click_id) for r in batch
    }


def test_stream_foreachbatch_to_sstable_sink(spark, sf_dir, events_stream_dir):
    """Streaming ingest INTO the cassowary-native format (S + A6):
    each micro-batch lands as sstable generations via foreachBatch +
    the staged-commit sink, and the merged batch read of the snapshot
    reconciles to exactly the streamed rows — the write half of the
    snapshot lifecycle, driven from Structured Streaming."""
    import tempfile

    from cassowary_spark.sources.sstable_datasource import read_sstable, write_sstable
    from cassowary_spark.streaming import jobs

    snap = tempfile.mkdtemp(prefix="sst_stream_sink_")
    stream = jobs.read_events_stream(spark, events_stream_dir)
    agg = (
        stream.withWatermark("ts", "100 days")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )

    def sink_batch(df, epoch_id):
        # append mode: one staged-commit generation set per epoch; the
        # per-user rows of later epochs supersede earlier ones by
        # write_ts = epoch so LWW merge keeps the newest count
        write_sstable(
            df.repartition(2, "user_id"), snap, key="user_id",
            mode="append", write_ts=int(epoch_id) + 1,
        )

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r.user_id: r.n_events for r in read_sstable(spark, snap).collect()}
    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stream_outer_join_emits_nulls(spark, tmp_path):
    """LEFT OUTER stream-stream join: a view with no click emits a
    NULL-click row once the watermark passes its match window; a view
    whose window is still open at end-of-stream emits nothing.

    Deterministic micro-stream: batch 1 = one matched view, one
    unmatched view; batch 2 = a far-future event that advances the
    watermark past batch 1's windows (but leaves its own open).
    """
    import os

    d = str(tmp_path / "outer_stream")
    base = "2024-01-01 00:00:00"

    def ev(eid, ts, uid, etype):
        return (eid, ts, uid, etype, 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    b1 = spark.createDataFrame(
        [
            ev(1, base, 1, "view"),
            ev(2, "2024-01-01 00:10:00", 1, "click"),
            ev(3, "2024-01-01 00:05:00", 2, "view"),
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # each watermark is computed AFTER its event_type filter, so a
    # view-only batch advances the view watermark but leaves the click
    # watermark parked — and the global watermark (min policy) with it.
    # Both far-future batches therefore carry one event of EACH type;
    # the far-future clicks are unmatched right-side rows, which a
    # LEFT OUTER join never emits.
    b2 = spark.createDataFrame(
        [
            ev(4, "2024-01-02 00:00:00", 99, "view"),
            ev(6, "2024-01-02 00:00:00", 97, "click"),
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # the watermark moves at batch END, so eviction (and the NULL-row
    # emission) happens one batch later — b3 provides that batch
    b3 = spark.createDataFrame(
        [
            ev(5, "2024-01-02 00:00:01", 98, "view"),
            ev(7, "2024-01-02 00:00:01", 96, "click"),
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    stream = jobs.read_events_stream(spark, _stage_batches(d, [b1, b2, b3]))
    got = _drain(
        spark,
        jobs.view_click_join_outer(stream, watermark="1 hour", within="30 minutes"),
        "t_ssouter",
    ).collect()
    rows = {(r.view_id, r.click_id) for r in got}
    assert (1, 2) in rows, rows  # matched pair emits
    assert (3, None) in rows, rows  # closed unmatched view emits NULL row
    assert (4, None) not in rows, rows  # still-open views held back
    assert (5, None) not in rows, rows


def test_dedup_within_watermark_cross_batch(spark, tmp_path):
    """S10: dropDuplicatesWithinWatermark drops a duplicate event_id
    arriving in a later micro-batch while both rows are inside the
    watermark delay; a re-send far outside the delay (state already
    evicted) passes through again."""
    import datetime as dt
    import glob
    import os
    import shutil

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    # batch 1: the original event + an unrelated one advancing max(ts)
    batch1 = [
        (1, base, 1, "click", 1.0, "{}"),
        (9, base + dt.timedelta(minutes=30), 2, "view", 1.0, "{}"),
    ]
    # batch 2: duplicate id 1 re-sent 10 min later (inside 1h delay)
    batch2 = [(1, base + dt.timedelta(minutes=10), 1, "click", 1.0, "{}")]
    # batch 3: far-future traffic evicts id 1's state, then batch 4
    # re-sends id 1 — state gone, so it is emitted a second time
    batch3 = [(8, base + dt.timedelta(hours=10), 3, "view", 1.0, "{}")]
    batch4 = [(1, base + dt.timedelta(hours=10), 1, "click", 1.0, "{}")]

    dirs = []
    for i, rows in enumerate((batch1, batch2, batch3, batch4)):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, jobs.EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        dirs.append(d)

    stream_dir = str(tmp_path / "stream")
    cp = str(tmp_path / "cp")
    os.makedirs(stream_dir)
    collected = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    def run_once():
        stream = jobs.read_events_stream(spark, stream_dir, max_files_per_trigger=1)
        q = (
            jobs.dedup_events_within_watermark(stream, watermark="1 hour")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for i, d in enumerate(dirs):
        shutil.copy(
            glob.glob(f"{d}/part-*.parquet")[0], f"{stream_dir}/{i:04d}.parquet"
        )
        run_once()

    by_id = {}
    for r in collected:
        by_id.setdefault(r.event_id, []).append(r.ts)
    assert len(by_id[9]) == 1 and len(by_id[8]) == 1
    # id 1: emitted for batch 1, suppressed in batch 2, re-emitted in
    # batch 4 after watermark-driven state eviction
    assert sorted(by_id[1]) == [base, base + dt.timedelta(hours=10)], by_id


def _has_protobuf() -> bool:
    """transformWithStateInPandas speaks protobuf to its state server;
    without the google.protobuf package the runner cannot start."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="state-v2 runtime needs google.protobuf (absent in this env)",
)
def test_transform_with_state_running_totals(spark, sf_dir, events_stream_dir):
    """S11: transformWithStateInPandas running totals — the LAST
    update emitted per user must equal the batch groupBy totals (the
    stream replays the same events in 4 micro-batches, so state must
    accumulate across batches, not reset)."""
    stream = jobs.read_events_stream(spark, events_stream_dir)
    q = jobs.run_to_memory(
        jobs.running_totals_tws(stream), "t_tws_totals", "update"
    )
    q.awaitTermination()
    # update mode appends one row per (batch, key); keep each key's last
    got = spark.sql(
        """
        SELECT user_id, n_events, sum_value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC
            ) AS rk FROM t_tws_totals
        ) WHERE rk = 1
        """
    ).collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .collect()
    )
    got_map = {r.user_id: (r.n_events, round(r.sum_value, 6)) for r in got}
    batch_map = {r.user_id: (r.n_events, round(r.sum_value, 6)) for r in batch}
    assert got_map == batch_map


def test_dynamic_gap_sessions_equals_batch(spark, sf_dir, events_stream_dir):
    """S12: per-row gap expression (5 min for errors, 30 min
    otherwise) must sessionize identically in streaming (complete
    mode) and batch — and errors must produce MORE sessions per
    (user) than a 30-minute flat gap would, proving the dynamic gap
    actually bites."""
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _drain(
        spark, jobs.dynamic_gap_sessions(stream), "t_dyn_sessions", "complete"
    ).collect()
    batch = jobs.dynamic_gap_sessions(
        load_table(spark, sf_dir, "events")
    ).collect()
    key = lambda r: (r.session_start, r.session_end, r.user_id, r.event_type)
    assert {key(r): r.n_events for r in got} == {
        key(r): r.n_events for r in batch
    }
    # the 5-minute error gap must fragment error activity more than
    # the 30-minute gap fragments the rest (per active user-type)
    import collections

    per_type = collections.Counter(r.event_type for r in batch)
    n_users_err = len({r.user_id for r in batch if r.event_type == "error"})
    n_users_view = len({r.user_id for r in batch if r.event_type == "view"})
    if n_users_err and n_users_view:
        assert (
            per_type["error"] / n_users_err >= per_type["view"] / n_users_view
        )


def test_stream_stream_full_outer_accounts_both_sides(spark, tmp_path):
    """S13: FULL OUTER stream-stream join — the orphan view emits a
    NULL-click row AND the orphan click emits a NULL-view row once
    the watermark closes their windows; the matched pair emits
    joined. Same 3-batch choreography as the LEFT OUTER test (each
    watermark-advancing batch carries both event types because each
    side's watermark is computed after its filter; eviction lands one
    batch after the watermark moves)."""
    import os

    d = str(tmp_path / "full_stream")

    def ev(eid, ts, uid, etype):
        return (eid, ts, uid, etype, 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    b1 = spark.createDataFrame(
        [
            ev(1, "2024-01-01 00:00:00", 1, "view"),
            ev(2, "2024-01-01 00:10:00", 1, "click"),   # matches view 1
            ev(3, "2024-01-01 00:05:00", 2, "view"),    # orphan view
            ev(4, "2024-01-01 00:07:00", 3, "click"),   # orphan click
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        [
            ev(5, "2024-01-02 00:00:00", 99, "view"),
            ev(6, "2024-01-02 00:00:00", 97, "click"),
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b3 = spark.createDataFrame(
        [
            ev(7, "2024-01-02 00:00:01", 98, "view"),
            ev(8, "2024-01-02 00:00:01", 96, "click"),
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    stream = jobs.read_events_stream(spark, _stage_batches(d, [b1, b2, b3]))
    got = _drain(
        spark,
        jobs.view_click_join_full(
            stream, watermark="1 hour", within="30 minutes"
        ),
        "t_ssfull",
    ).collect()
    rows = {(r.view_id, r.click_id) for r in got}
    assert (1, 2) in rows, rows       # matched pair
    assert (3, None) in rows, rows    # orphan view accounted
    assert (None, 4) in rows, rows    # orphan click accounted
    assert (5, None) not in rows, rows  # still-open windows held back
    assert (None, 6) not in rows, rows


def test_stream_stream_semi_join_emits_once(spark, tmp_path):
    """LEFT SEMI stream-stream join: a view with TWO clicks in its
    window — the second arriving in a LATER micro-batch, the
    state-store matched-flag path where a broken semi join would
    double-emit — emits exactly once (inner would emit twice); a view
    with no click never emits; no click columns appear in the schema."""
    d = str(tmp_path / "semi_stream")

    def ev(eid, ts, uid, etype):
        return (eid, ts, uid, etype, 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    b1 = spark.createDataFrame(
        [
            ev(1, "2024-01-01 00:00:00", 1, "view"),
            ev(2, "2024-01-01 00:05:00", 1, "click"),
            ev(4, "2024-01-01 00:00:00", 2, "view"),  # never clicked
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # second in-window click for view 1 lands one batch LATER —
    # at-most-once must hold across batches, not just within one
    b2 = spark.createDataFrame(
        [
            ev(3, "2024-01-01 00:10:00", 1, "click"),
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b3 = spark.createDataFrame(
        [
            ev(5, "2024-01-02 00:00:00", 99, "view"),
            ev(6, "2024-01-02 00:00:00", 97, "click"),
        ],
        cols,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    stream = jobs.read_events_stream(spark, _stage_batches(d, [b1, b2, b3]))
    out = jobs.view_click_join_semi(
        stream, watermark="1 hour", within="30 minutes"
    )
    assert "click_id" not in out.columns
    got = _drain(spark, out, "t_sssemi").collect()
    view_ids = [r.view_id for r in got]
    assert view_ids.count(1) == 1, view_ids  # cross-batch double click: once
    assert 4 not in view_ids, view_ids  # unclicked view: never


def test_dp_release_stream_equals_batch_with_reused_noise(
    spark, sf_dir, events_stream_dir
):
    """S17: the streaming DP release's FINAL state must equal the
    batch mechanism applied to the full table, and each key's noise
    must match the pure-Python staircase reference — proving the
    noise is a deterministic function of the key (noise reuse), not
    a per-trigger draw."""
    import hashlib

    from cassowary_spark.queries.datapipe32 import _DP_K, _DP_TS

    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = {
        r.event_type: r
        for r in _drain(
            spark, jobs.dp_type_counts(stream), "t_dp_release", "complete"
        ).collect()
    }
    true_n = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(true_n)
    for et, r in got.items():
        u32 = int(hashlib.md5(et.encode()).hexdigest()[:8], 16)
        expect_noise = -_DP_K + sum(1 for t in _DP_TS if u32 >= t)
        assert r.noise == expect_noise, et
        assert r.dp_n == true_n[et] + expect_noise, et
