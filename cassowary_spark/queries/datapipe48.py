"""Round-9 wave 50 (SURVEY.md §2): partition-balance audit (C187) —
the pre-flight answer to "will this key hash-partition evenly on a
real cluster", closing the skew toolkit's loop (C30 finds hot KEYS,
B13b salts a known-skewed join, this scores a PARTITIONING before a
job bets 1000 executors on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

_PB_BUCKETS = 32


@query(
    "q_partition_balance",
    oracle=f"""
    WITH b AS (
        SELECT CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % {_PB_BUCKETS} AS INT) AS bucket
        FROM events
    ),
    per AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
        FROM b GROUP BY bucket
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(n_rows) AS BIGINT) AS n_total,
               CAST(max(n_rows) AS BIGINT) AS max_rows,
               CAST(min(n_rows) AS BIGINT) AS min_rows
        FROM per
    )
    SELECT n_buckets, n_total, max_rows, min_rows,
           {sql_srnd(
               "CAST(max_rows AS DOUBLE) * CAST(n_buckets AS DOUBLE)"
               " / CAST(n_total AS DOUBLE)", 6)} AS imbalance,
           CAST(CASE WHEN
               {sql_srnd(
                   "CAST(max_rows AS DOUBLE) * CAST(n_buckets AS DOUBLE)"
                   " / CAST(n_total AS DOUBLE)", 6)} > 1.5
               THEN 1 ELSE 0 END AS INT) AS skew_flag
    FROM tot
    """,
)
def q_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-balance audit (C187): bucket events by the
    md5-hash of the candidate shuffle key (user_id) into
    {_PB_BUCKETS} buckets and report max/min bucket sizes and the
    imbalance ratio max/mean — the pre-flight check for "can this
    key feed a {_PB_BUCKETS}-way (or 1000-way) shuffle without a
    straggler". The skew toolkit's missing audit: C30 names the hot
    keys after a job straggles, B13b salts a join already known to
    skew — this SCORES a partitioning before the job runs, which is
    when the decision (salt, pre-aggregate, different key) is cheap.
    The flag fires at imbalance > 1.5 (the slowest task does 1.5× the
    mean — a straggler on a synchronous stage barrier), compared on
    the srnd6-QUANTIZED ratio so a 1-ulp wiggle can't flip it.

    Determinism: bucket assignment is the engine-shared md5-u32
    idiom (Spark's own hash() differs from every other engine's —
    the audit must be reproducible off-cluster); counts exact
    BIGINTs; one srnd6 ratio.

    Scale shape: one map-side-combining groupBy to {_PB_BUCKETS}
    rows, then a 1-row rollup — the audit costs one pass of the
    candidate frame no matter the cluster. At 100 TB you run it on
    a hash-sample of the key column (C94's row-local predicate)
    for the same answer at 1% the scan.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % _PB_BUCKETS
    ).cast("int")
    per = ev.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    tot = per.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("n_rows").cast("long").alias("n_total"),
        F.max("n_rows").cast("long").alias("max_rows"),
        F.min("n_rows").cast("long").alias("min_rows"),
    )
    imb = srnd(
        F.col("max_rows").cast("double")
        * F.col("n_buckets").cast("double")
        / F.col("n_total").cast("double"),
        6,
    )
    return tot.select(
        "n_buckets",
        "n_total",
        "max_rows",
        "min_rows",
        imb.alias("imbalance"),
        F.when(imb > 1.5, 1).otherwise(0).cast("int").alias("skew_flag"),
    )
