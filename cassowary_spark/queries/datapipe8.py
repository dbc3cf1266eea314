"""Round-6 wave 9 (SURVEY.md §2): seasonal-baseline anomaly screening,
event co-occurrence lift, and deterministic weighted reservoir
sampling — three population-level analytics the earlier waves' per-
entity screens (C38 z-score, C57 MAD, C58 rate) don't cover.

The weighted sampler is the A-res (Efraimidis-Spirakis) scheme with
the random uniform replaced by an md5-derived rational, so the sample
is reproducible across runs, engines, and cluster sizes — the same
determinism contract as C6/C8's unweighted hash sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------- C73 seasonal-baseline outliers


@query(
    "q_seasonal_baseline",
    oracle=f"""
    WITH cells AS (
        SELECT event_type, EXTRACT(hour FROM ts) AS hod,
               {sql_srnd("avg(value)", 6)} AS mean_r,
               {sql_srnd("stddev_samp(value)", 6)} AS std_r,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT e.event_type, EXTRACT(hour FROM e.ts) AS hod,
           c.n AS n_events,
           CAST(sum(CASE WHEN abs(e.value - c.mean_r) > 2.5 * c.std_r
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN cells c ON c.event_type = e.event_type
                AND c.hod = EXTRACT(hour FROM e.ts)
    GROUP BY 1, 2, 3
    """,
)
def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly screen (C73): flag events whose value
    sits >2.5σ from the mean of their OWN (event_type × hour-of-day)
    cell — the seasonal sibling of C38's per-user z-score (a value
    normal at 14:00 may be anomalous at 03:00; per-entity baselines
    can't see that). Output is the per-cell outlier census a
    monitoring pipeline alerts on.

    Scale shape: the baseline table is one (type, hour)-keyed
    partial-agg groupBy collapsing to ≤ types×24 rows — it broadcasts
    back, the event side never shuffles for the join; the flag is
    row-local (mean/std srnd-quantized to 6dp first, so the compare
    is the same IEEE sequence on both engines) and the census reuses
    the same tiny key. stddev is explicitly the SAMPLE form on both
    engines.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "hod", F.hour("ts").cast("long")
    )
    cells = ev.groupBy("event_type", "hod").agg(
        srnd(F.avg("value"), 6).alias("mean_r"),
        srnd(F.stddev_samp("value"), 6).alias("std_r"),
        F.count("*").alias("n_events"),
    )
    flagged = ev.join(F.broadcast(cells), ["event_type", "hod"])
    return flagged.groupBy("event_type", "hod", "n_events").agg(
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("mean_r"))
                > F.lit(2.5) * F.col("std_r"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers")
    )


# --------------------------------------- C74 event co-occurrence lift


@query(
    "q_cooccurrence",
    oracle=f"""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n_users AS (SELECT count(DISTINCT user_id) AS nu FROM events),
    singles AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           {sql_srnd(
               "CAST(p.n_both AS DOUBLE) * nu.nu / (sa.n * sb.n)", 6)}
               AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN n_users nu
    """,
)
def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift (C74): for every unordered pair of
    event types, how many users exhibit BOTH, and the association lift
    P(a∧b)/(P(a)·P(b)) — the market-basket statistic (lift > 1 ⇒ the
    behaviors attract; < 1 ⇒ they repel). Complements C60's ordered
    transition matrix with the order-free association view.

    Scale shape: the corpus collapses FIRST to distinct (user, type)
    — one map-side-combining shuffle bounded by users × types; the
    pair join is user-keyed on that slim frame with ≤ types² fanout
    per user (constant); pair/single counts are tiny-key partial
    aggs, and the lift assembly is broadcast-only. The user count
    rides a 1-row crossJoin. Never corpus-quadratic.
    """
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    nu = ev.select(
        F.countDistinct("user_id").alias("nu")
    )
    singles = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            "n_both",
            srnd(
                F.col("n_both").cast("double")
                * F.col("nu")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ------------------------------- C75 weighted reservoir sampling (A-res)

_WRS_K = 50


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH pr AS (
        SELECT doc_id, lang, n_chars,
               {sql_srnd(
                   "ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
                   " AS BIGINT) + 1) / 4294967296.0) / n_chars", 8)}
                   AS priority_r
        FROM documents
    )
    SELECT doc_id, lang, n_chars, priority_r
    FROM pr
    ORDER BY priority_r DESC, doc_id
    LIMIT {_WRS_K}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample (C75): A-res
    (Efraimidis-Spirakis) — keep the top-k documents by priority
    u^(1/w), equivalently ln(u)/w, where w = n_chars (longer docs
    proportionally likelier) and u is an md5-derived rational in
    (0, 1] instead of an RNG draw. Same doc ⇒ same u on every run,
    engine, and cluster size — the weighted upgrade of C6/C8's hash
    sampling, used when sampling proportional to tokens (training
    mixes, eval panels) instead of uniformly per doc.

    Scale shape: the priority is a row-local expression (hex-prefix
    parse + one ln per row); the cut is TakeOrdered top-k — no global
    sort materializes, partial top-k per partition then a k-row merge
    at the driver, exactly the q_topk pattern. Priorities are
    srnd-quantized with a doc_id tiebreak so the boundary of the
    sample is engine-stable.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967296.0)
    pr = d.select(
        "doc_id",
        "lang",
        "n_chars",
        srnd(F.log(u) / F.col("n_chars"), 8).alias("priority_r"),
    )
    return pr.orderBy(
        F.desc("priority_r"), F.asc("doc_id")
    ).limit(_WRS_K)


# -------------------------------------------- B51 SQL-defined functions


@query(
    "q_sql_udf",
    oracle="""
    SELECT CASE WHEN l_discount < 0.03 THEN 'low'
                WHEN l_discount < 0.07 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice / nullif(l_quantity, 0.0)
                               * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS unit_cents_sum
    FROM lineitem GROUP BY 1
    """,
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (B51): `CREATE FUNCTION ... RETURN
    <expr>` (Spark 4 SQL UDFs) — the modern form of Hive's `CREATE
    TEMPORARY MACRO`, the reusable-expression surface HiveQL report
    suites were built from. Two functions (a discount banding CASE and
    an integer-cents unit price) defined in SQL, then used in a plain
    rollup; the oracle inlines the same expressions, so the function
    registration, argument binding, and NULL path (nullif guard) all
    gate the hash.

    Scale shape: SQL UDFs are inlined into the plan at analysis time —
    they are NOT black-box row functions; the optimizer sees the
    expanded expression (pushdown/codegen intact), so this costs
    exactly what writing the expression inline costs. One partial agg
    on a 3-value key.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_band(d DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN d < 0.03 THEN 'low' "
        "WHEN d < 0.07 THEN 'mid' ELSE 'high' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION unit_cents(p DOUBLE, q DOUBLE) "
        "RETURNS BIGINT "
        "RETURN CAST(floor(p / nullif(q, 0.0) * 100.0 + 0.5) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT disc_band(l_discount) AS band,
               count(*) AS n_rows,
               sum(unit_cents(l_extendedprice, l_quantity))
                   AS unit_cents_sum
        FROM lineitem GROUP BY 1
        """
    )
