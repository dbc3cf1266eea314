"""Window functions + sort/limit/top-k (SURVEY.md §2 B23–B29).

Window partitions hash-shuffle once on the partition key and sort
within; every ORDER BY here includes a unique tiebreaker so ranking
is total (nondeterministic row_number over ties is the classic
oracle-mismatch trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cassowary_spark.operators.topk import top_k_per_group
from cassowary_spark.exprs import srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


@query(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS prnk,
           cume_dist()    OVER w AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking battery per market segment (B23)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "q_window_analytic",
    oracle="""
    SELECT event_id, user_id,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/last_value per user timeline (B24)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(wfull).alias("last_val"),
    )


@query(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0
               AS running_sum,
           floor((avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0
               AS moving_avg4,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_n
    FROM events
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-bounded running sum / moving average (B25)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        srnd(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 4).alias("running_sum"),
        srnd(F.avg("value").over(w.rowsBetween(-3, 0)), 4).alias("moving_avg4"),
        F.count("*").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("running_n"),
    )


@query(
    "q_orderby",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (B26, B28) → TakeOrderedAndProject:
    each task keeps a 100-row heap; no global sort materializes."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.desc_nulls_last("l_extendedprice"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        )
        .limit(100)
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (B29) via the reusable operator."""
    o = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        o,
        partition_by=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select("o_orderpriority", "o_orderkey", "o_totalprice")


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_below,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_near,
           floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)) * 100.0 + 0.5) / 100.0 AS near_sum
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frames (B25's value-based form): the frame is every
    peer within ±10000 of the current ORDER BY VALUE, not a row count —
    deterministic regardless of tie order, which is exactly why it
    complements the ROWS battery. Same single shuffle + sort per
    partition key as any window."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w.rangeBetween(-10000, 0)).alias("n_below"),
        F.count("*").over(w.rangeBetween(-10000, 10000)).alias("n_near"),
        srnd(F.sum("o_totalprice").over(w.rangeBetween(-10000, 10000)), 2).alias("near_sum"),
    )


@query(
    "q_sessionize_sql",
    oracle="""
    WITH sec AS (
        SELECT user_id, event_id, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events
    ), marked AS (
        SELECT user_id, event_id, value, sec,
               CASE WHEN lag(sec) OVER w IS NULL
                         OR sec - lag(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM sec
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), sess AS (
        SELECT user_id, value,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_no
        FROM marked
    )
    SELECT user_id, session_no, count(*) AS n_events,
           floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM sess GROUP BY user_id, session_no
    """,
)
def q_sessionize_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands (B23/B25 composition;
    the batch twin of S3's session windows, expressed as pure window
    algebra): a session break is a >30-min gap to the previous event;
    the running sum of break markers numbers sessions per user.

    Scale shape: ONE hash shuffle keyed by user_id serves both windows
    (same partitioning + ordering, Catalyst reuses the sort), then the
    per-session groupBy re-keys by (user_id, session_no) — no joins,
    no state, no skew beyond per-user event counts. Timestamps
    compare as floor-epoch seconds on BOTH engines: the fixture's ts
    carries microseconds, and interval arithmetic at full precision
    would make the 1800s boundary engine-dependent.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = W.partitionBy("user_id").orderBy(sec, "event_id")
    gap = sec - F.lag(sec).over(w)
    marked = e.select(
        "user_id",
        "event_id",
        "value",
        sec.alias("sec"),
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("is_new"),
    )
    wrun = W.partitionBy("user_id").orderBy("sec", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    sess = marked.withColumn("session_no", F.sum("is_new").over(wrun))
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        srnd(F.sum("value"), 4).alias("sum_value"),
    )
