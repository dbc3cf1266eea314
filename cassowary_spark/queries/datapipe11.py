"""Round-6 wave 13 (SURVEY.md §2): regression aggregates, interval
max-concurrency, and order-insensitive table fingerprints — trend
estimation, capacity analysis, and replica-verification machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------------ B52 regression aggregates


@query(
    "q_regression",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS x,
               value AS y
        FROM events
    )
    SELECT event_type,
           count(*) AS n,
           {sql_srnd("regr_slope(y, x)", 4)} AS slope,
           {sql_srnd("regr_intercept(y, x)", 4)} AS intercept,
           {sql_srnd("regr_r2(y, x)", 4)} AS r2
    FROM pts GROUP BY 1
    """,
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression aggregates (B52): per event type, the least-squares
    slope / intercept / R² of value against hours-since-epoch-start —
    the SQL:2003 `REGR_*` family (trend estimation inside the
    warehouse: "is this metric drifting and how fast"), beyond B17's
    corr/covar (direction + strength but no fitted line).

    Determinism: x is an INTEGER hour offset from a fixed anchor
    (small magnitudes keep the internal Σx², Σxy sums well-
    conditioned); the aggregate's internal sums are unordered double
    reductions, so outputs are srnd'd to 4dp — the same tolerance
    budget every avg/stddev in the registry uses.

    Scale shape: regr_* are ordinary declarative aggregates — partial
    state is six numbers per group, combines map-side like sum/count;
    ONE 5-key partial-agg groupBy, zero joins. This is the cheapest
    possible trend pass over an event stream.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (
            (F.unix_timestamp("ts") - F.unix_timestamp(
                F.lit("2024-01-01 00:00:00").cast("timestamp")
            )) / F.lit(3600)
        ).cast("long").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    return pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        srnd(F.regr_slope("y", "x"), 4).alias("slope"),
        srnd(F.regr_intercept("y", "x"), 4).alias("intercept"),
        srnd(F.regr_r2("y", "x"), 4).alias("r2"),
    )


# --------------------------------------- C84 interval max concurrency


@query(
    "q_max_concurrency",
    oracle="""
    WITH iv AS (
        SELECT event_type, ts AS s,
               ts + INTERVAL 1 MINUTE
                       * (1 + CAST(floor(value) AS BIGINT) % 30) AS e
        FROM events
    ),
    pts AS (
        SELECT event_type, s AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta FROM iv
    ),
    run AS (
        SELECT event_type,
               sum(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS conc
        FROM pts
    )
    SELECT event_type,
           CAST(max(conc) AS BIGINT) AS max_concurrent,
           CAST(count(*) / 2 AS BIGINT) AS n_intervals
    FROM run GROUP BY 1
    """,
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval max-concurrency (C84): peak number of simultaneously
    open intervals per event type (each event opens a value-derived
    1-30 minute window) — the capacity/occupancy statistic (peak
    concurrent sessions, licenses, connections) and the interval-
    algebra sibling of C23's gaps-and-islands. Classic sweep-line: ±1
    boundary events, running sum, max.

    Determinism: half-open [s, e) semantics — at equal timestamps the
    −1 sorts before the +1 (ORDER BY t, delta), so an interval ending
    exactly when another starts never double-counts; ties WITHIN a
    delta class cannot change the running-sum maximum (the max is
    read after the tied block's net effect either way).

    Scale shape: boundary explosion is row-local (2 rows per
    interval); ONE type-keyed window carries the sweep (running frame
    — the incremental O(n) kind); the rollup reuses the same key. At
    scale with millions of keys the partition is the entity, exactly
    this plan; for ONE global key you'd pre-aggregate per time bucket
    (net delta + running max per bucket) before a tiny global pass —
    noted, not needed here.
    """
    ev = load_table(spark, sf_dir, "events")
    dur_min = (
        F.lit(1) + F.floor(F.col("value")).cast("long") % 30
    )
    iv = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        (
            F.col("ts")
            + (dur_min * F.lit(60)).cast("string")
            .cast("interval second")
        ).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            "event_type", F.col("e").alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("conc", F.sum("delta").over(w))
    return run.groupBy("event_type").agg(
        F.max("conc").cast("long").alias("max_concurrent"),
        (F.count("*") / 2).cast("long").alias("n_intervals"),
    )


# ----------------------------------------- C85b table fingerprinting


@query(
    "q_table_fingerprint",
    oracle="""
    WITH li AS (
        SELECT bit_xor(CAST(('0x' || substr(md5(
                   CAST(l_orderkey AS VARCHAR) || '|'
                   || CAST(l_linenumber AS VARCHAR) || '|'
                   || CAST(CAST(floor(l_extendedprice * 100.0 + 0.5)
                           AS BIGINT) AS VARCHAR)), 1, 15)) AS BIGINT))
                   AS fp,
               count(*) AS n
        FROM lineitem
    ),
    o AS (
        SELECT bit_xor(CAST(('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|'
                   || CAST(o_custkey AS VARCHAR) || '|'
                   || CAST(CAST(floor(o_totalprice * 100.0 + 0.5)
                           AS BIGINT) AS VARCHAR)), 1, 15)) AS BIGINT))
                   AS fp,
               count(*) AS n
        FROM orders
    )
    SELECT 'lineitem' AS tbl, n AS n_rows, fp AS fingerprint FROM li
    UNION ALL
    SELECT 'orders' AS tbl, n AS n_rows, fp AS fingerprint FROM o
    """,
)
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint (C85b): XOR-fold of
    canonical per-row hashes — the replica-consistency check (same
    fingerprint ⇔ same multiset of rows up to XOR collisions) used to
    verify a migration, a backup restore, or cross-engine replication
    WITHOUT sorting or shuffling the table: XOR is commutative/
    associative, so any partitioning and any row order give the same
    fold. The canonical row rendering uses only integers (keys +
    cents) so both engines serialize identically; md5's first 15 hex
    chars keep the value positive in an int64.

    Scale shape: this is the cheapest whole-table integrity pass
    possible — row-local hash, map-side XOR partials, a 1-row result
    per table; no sort, no shuffle beyond the final 1-row combine.
    A per-partition-directory variant (GROUP BY partition key) gives
    drill-down at the same cost.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    from cassowary_spark.operators.skew import spread_narrow_input

    def fp(df: DataFrame, cols: list, name: str) -> DataFrame:
        # r15: the per-row md5 ran inside a 1-task scan stage on
        # single-row-group fixtures — spread the NARROW canonical
        # projection (3 longs/row) when under-parallel; XOR is
        # commutative/associative so any partitioning folds the same
        # (no-op at corpus scale). The key column is the first canon
        # column (orderkey — high-cardinality).
        canon_cols = [
            c.cast("string").alias(f"__c{i}") for i, c in enumerate(cols)
        ]
        narrow = spread_narrow_input(df.select(*canon_cols), "__c0")
        canon = F.concat_ws("|", *[F.col(f"__c{i}") for i in range(len(cols))])
        h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
        return narrow.agg(
            F.lit(name).alias("tbl"),
            F.count("*").alias("n_rows"),
            F.bit_xor(h).alias("fingerprint"),
        ).select("tbl", "n_rows", "fingerprint")

    cents = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("long")  # noqa: E731
    return fp(
        li,
        [F.col("l_orderkey"), F.col("l_linenumber"), cents(F.col("l_extendedprice"))],
        "lineitem",
    ).unionByName(
        fp(
            o,
            [F.col("o_orderkey"), F.col("o_custkey"), cents(F.col("o_totalprice"))],
            "orders",
        )
    )
