"""Windowed event aggregation — batch-equivalent forms (SURVEY.md §2 S1–S3).

Structured Streaming runs the SAME logical plan over readStream
(cassowary_spark/streaming/jobs.py — verified batch-vs-stream
equivalent in tests); these batch registrations give the driver an
oracle-checkable form. Tumbling/sliding windows are epoch-aligned in
both Spark and DuckDB's time_bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*)                AS n_events,
           floor((sum(value)) * 10000.0 + 0.5) / 10000.0    AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window agg (S1) — keyed state at scale is
    (#windows × #types), shuffled once."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), srnd(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH assigned AS (
        SELECT unnest([
                   time_bucket(INTERVAL '30 minutes', ts),
                   time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
               ]) AS window_start,
               value
        FROM events
    )
    SELECT window_start,
           count(*)             AS n_events,
           floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM assigned
    GROUP BY window_start
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 1h/30m (S2): each event lands in 2 windows; the
    oracle replicates Spark's assignment by unnesting the two bucket
    starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), srnd(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "q_stream_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ), grouped AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM marked
    )
    SELECT user_id,
           min(ts)                         AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*)                        AS n_events,
           floor((sum(value)) * 10000.0 + 0.5) / 10000.0            AS sum_value
    FROM grouped
    GROUP BY user_id, grp
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window, 30m gap (S3). Spark sessions are half-open
    [start, last+gap): an event exactly gap-after the previous one
    starts a NEW session — hence `>=` in the oracle's break condition.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), srnd(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n_unique
    FROM (SELECT DISTINCT event_id, event_type FROM events)
    GROUP BY event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup by event_id (S5, batch form): the streaming twin
    is dropDuplicates within a watermark (tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
    )


@query(
    "q_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_events,
           floor((sum(e.value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (S6, batch form): events stream ⋈
    broadcast customer dim."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), srnd(F.sum("value"), 4).alias("sum_value"))
    )


@query(
    "q_session_capped",
    # The per-user fold IS SQL-expressible — as a recursive CTE
    # stepping one event per user per iteration (depth = max events
    # per user). Far too slow to be the engine (quadratic rescans per
    # round, no partial state), but exactly right as an oracle: it
    # re-derives session boundaries (gap OR cap) from first
    # principles. Events are (user_id, ts)-unique in the fixture, so
    # the fold order is deterministic in both engines.
    oracle="""
    WITH RECURSIVE ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us, CAST(value AS DOUBLE) AS value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        FROM events
    ),
    fold AS (
        SELECT user_id, rn, ts_us AS start_us, ts_us AS last_us,
               CAST(1 AS BIGINT) AS n_events, value AS sum_value,
               (value >= 200.0) AS closed_now
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.rn,
               CASE WHEN f.closed_now OR e.ts_us - f.last_us > 1800000000
                    THEN e.ts_us ELSE f.start_us END,
               e.ts_us,
               CASE WHEN f.closed_now OR e.ts_us - f.last_us > 1800000000
                    THEN 1 ELSE f.n_events + 1 END,
               CASE WHEN f.closed_now OR e.ts_us - f.last_us > 1800000000
                    THEN e.value ELSE f.sum_value + e.value END,
               CASE WHEN f.closed_now OR e.ts_us - f.last_us > 1800000000
                    THEN e.value >= 200.0
                    ELSE f.sum_value + e.value >= 200.0 END
        FROM ev e JOIN fold f ON e.user_id = f.user_id AND e.rn = f.rn + 1
    )
    SELECT f.user_id,
           make_timestamp(f.start_us) AS session_start,
           make_timestamp(f.last_us)  AS session_end,
           f.n_events,
           floor(f.sum_value * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM fold f
    LEFT JOIN fold nx ON nx.user_id = f.user_id AND nx.rn = f.rn + 1
    WHERE f.closed_now OR nx.rn IS NULL OR nx.n_events = 1
    """,
)
def q_session_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-capped sessionization (S7, batch form): sessions close on
    30-min inactivity OR cumulative value >= 200 — the second rule is a
    sequential per-user fold session_window cannot express. Runs the
    same applyInPandas fold as the applyInPandasWithState stream job
    (equivalence tested in tests/test_streaming.py); one shuffle on
    user_id, state bounded by keys not events."""
    from cassowary_spark.streaming.jobs import value_capped_sessions_batch

    ev = load_table(spark, sf_dir, "events")
    out = value_capped_sessions_batch(ev, gap_minutes=30, cap=200.0)
    return out.select(
        "user_id", "session_start", "session_end", "n_events",
        srnd("sum_value", 4).alias("sum_value"),
    )


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           v.ts AS view_ts,
           c.ts AS click_ts
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (batch form): views ⋈ same-user
    clicks within 30 minutes.

    The streaming twin (streaming/jobs.view_click_join, equivalence
    tested) watermarks both sides so state retention is bounded by
    watermark + interval; this batch form is the same plan over the
    static table — an equi-join on user_id with a range residual, so
    the shuffle is an ordinary hash partition, never a cartesian.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").alias("v")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    return v.join(
        c,
        F.expr(
            "v.user_id = c.user_id AND c.ts >= v.ts"
            " AND c.ts <= v.ts + INTERVAL 30 MINUTES"
        ),
    ).select(
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("v.ts").alias("view_ts"),
        F.col("c.ts").alias("click_ts"),
    )


@query(
    "q_stream_late_data",
    oracle="""
    WITH ev AS (
        SELECT *, event_id % 4 AS batch_id FROM events
    ),
    bmax AS (
        SELECT batch_id, max(ts) AS bm FROM ev GROUP BY batch_id
    ),
    wm AS (
        SELECT batch_id,
               max(bm) OVER (ORDER BY batch_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 - INTERVAL '6 hours' AS wm_ts
        FROM bmax
    ),
    kept AS (
        SELECT ev.* FROM ev JOIN wm USING (batch_id)
        WHERE wm_ts IS NULL OR ts >= wm_ts
    )
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           count(*)                                      AS n_events,
           floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM kept
    GROUP BY 1
    """,
)
def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data drop (S4) — deterministic batch twin.

    Models Structured Streaming's trigger semantics exactly: arrival
    is micro-batched (batch = event_id % 4 — a STRIPED order, so every
    batch spans the full time range and later batches genuinely carry
    late events), the watermark before batch b is max event-time of
    all PRIOR batches minus the 6h delay, and a row is dropped iff it
    arrives below that watermark. The kept rows (batch 0 entirely +
    each later batch's tail above the watermark — ~26% at sf0.01)
    aggregate into the tumbling 1h windows of S1. The streaming form
    is `jobs.tumbling_counts` (withWatermark('ts','6 hours')),
    equivalence-tested in tests/test_streaming.py.

    Scale: the only ordered window runs over #batches rows (4), the
    per-batch maxes are a map-side partial agg, and the watermark
    table broadcast-joins back — no global per-row ordering anywhere.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "batch_id", F.col("event_id") % 4
    )
    bmax = ev.groupBy("batch_id").agg(F.max("ts").alias("bm"))
    from pyspark.sql import Window

    w = Window.orderBy("batch_id").rowsBetween(Window.unboundedPreceding, -1)
    wm = bmax.select(
        "batch_id",
        (F.max("bm").over(w) - F.expr("INTERVAL 6 HOURS")).alias("wm_ts"),
    )
    kept = ev.join(F.broadcast(wm), "batch_id").filter(
        F.col("wm_ts").isNull() | (F.col("ts") >= F.col("wm_ts"))
    )
    return (
        kept.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), srnd(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "q_stream_stream_outer",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           v.ts AS view_ts,
           c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def q_stream_stream_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join (S9b, batch form): every
    view emits — paired with same-user clicks within 30 minutes, or
    with NULL click columns when none exist.

    The streaming twin (streaming/jobs.view_click_join_outer) can only
    emit a NULL row after the watermark passes the view's match window
    (tested deterministically in tests/test_streaming.py); the batch
    form decides it immediately. Plan: same single hash shuffle on
    user_id as the inner form — outer-ness changes emission, not
    partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").alias("v")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    return v.join(
        c,
        F.expr(
            "v.user_id = c.user_id AND c.ts >= v.ts"
            " AND c.ts <= v.ts + INTERVAL 30 MINUTES"
        ),
        "leftOuter",
    ).select(
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("v.ts").alias("view_ts"),
        F.col("c.ts").alias("click_ts"),
    )
