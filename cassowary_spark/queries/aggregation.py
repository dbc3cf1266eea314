"""Aggregation surface (SURVEY.md §2 B14–B22).

Every groupBy here compiles to partial (map-side) + final hash
aggregation — the shuffle carries one row per (task, group), so these
stay cheap at 100 TB as long as group cardinality is bounded.
Float-aggregation outputs are rounded identically on both sides
because Spark and DuckDB sum in different orders (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


@query(
    "q_agg_basic",
    oracle="""
    SELECT o_orderpriority,
           count(*)                       AS n_orders,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0    AS sum_price,
           floor((avg(o_totalprice)) * 10000.0 + 0.5) / 10000.0    AS avg_price,
           min(o_totalprice)              AS min_price,
           max(o_totalprice)              AS max_price
    FROM orders
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash agg count/sum/avg/min/max + HAVING (B14, B21)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            srnd(F.sum("o_totalprice"), 2).alias("sum_price"),
            srnd(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .filter(F.col("n_orders") > 10)
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)  AS n_supp,
           count(DISTINCT l_partkey)  AS n_part,
           count(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi COUNT(DISTINCT) — Catalyst expands to a single pass (B15)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_approx",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(*)                  AS n_rows,
           TRUE                      AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, B16) — the scale path for NDV.

    Sketch estimates are engine-specific, so the raw approx value can't
    be oracle-hashed; instead the query emits the exact count plus a
    deterministic "the sketch is within 5% of exact" boolean, and the
    oracle asserts exact + TRUE. The HLL++ rsd is 2%, so 5% is a
    stable margin, and B16 now contributes a hard driver signal.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Two-level agg instead of COUNT(DISTINCT)-plus-approx in one pass:
    # mixing a distinct agg with other aggs makes Catalyst Expand every
    # input row through two agg paths (~3× runtime measured). Here the
    # first groupBy dedups (flag, partkey) with map-side combine, and
    # the second computes exact NDV (= count), total rows (= sum), and
    # the HLL sketch over already-distinct keys — identical estimate,
    # no Expand, both shuffles carry partial-agg'd slim rows.
    per_part = li.groupBy("l_returnflag", "l_partkey").agg(F.count("*").alias("n"))
    return (
        per_part.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("exact_parts"),
            F.sum("n").alias("n_rows"),
            F.approx_count_distinct("l_partkey", 0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "n_rows",
            (
                F.abs(F.col("_approx").cast("double") - F.col("exact_parts").cast("double"))
                / F.col("exact_parts").cast("double")
                <= 0.05
            ).alias("approx_within_5pct"),
        )
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_linestatus,
           floor((stddev_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0            AS sd_qty,
           floor((var_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0               AS var_qty,
           floor((stddev_pop(l_discount)) * 10000.0 + 0.5) / 10000.0             AS sdp_disc,
           floor((corr(l_quantity, l_discount)) * 10000.0 + 0.5) / 10000.0       AS corr_qd,
           floor((covar_samp(l_quantity, l_discount)) * 10000.0 + 0.5) / 10000.0 AS covs_qd,
           floor((covar_pop(l_quantity, l_discount)) * 10000.0 + 0.5) / 10000.0  AS covp_qd
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (B17) on small-magnitude columns.

    skewness/kurtosis are exercised in unit tests only: Spark uses
    population formulas, DuckDB bias-corrected sample formulas, so
    their values legitimately differ.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        srnd(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        srnd(F.var_samp("l_quantity"), 4).alias("var_qty"),
        srnd(F.stddev_pop("l_discount"), 4).alias("sdp_disc"),
        srnd(F.corr("l_quantity", "l_discount"), 4).alias("corr_qd"),
        srnd(F.covar_samp("l_quantity", "l_discount"), 4).alias("covs_qd"),
        srnd(F.covar_pop("l_quantity", "l_discount"), 4).alias("covp_qd"),
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           floor((quantile_cont(l_quantity, 0.25)) * 10000.0 + 0.5) / 10000.0 AS q25_qty,
           floor((quantile_cont(l_quantity, 0.5)) * 10000.0 + 0.5) / 10000.0  AS median_qty,
           floor((quantile_cont(l_quantity, 0.9)) * 10000.0 + 0.5) / 10000.0  AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (B18).

    Spark `percentile` == DuckDB `quantile_cont` (linear interpolation).
    percentile_approx (the 100 TB path) is covered rows-only in tests —
    its sketch values are engine-specific.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        srnd(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25_qty"),
        srnd(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        srnd(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
    )


@query(
    "q_rollup_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)         AS g_rf,
           grouping(l_linestatus)         AS g_ls,
           count(*)                       AS n_rows,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0      AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping() indicators (B19) — one Expand, one agg pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count("*").alias("n_rows"),
        srnd(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "q_collect",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
           count(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted → joined to a string (B20).

    Stringified so the value hash is representation-independent; the
    sort fixes collect_set's nondeterministic accumulation order.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias("priorities"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           floor((sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)) * 100.0 + 0.5) / 100.0 AS F,
           floor((sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)) * 100.0 + 0.5) / 100.0 AS O,
           floor((sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END)) * 100.0 + 0.5) / 100.0 AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on order status (B22) — explicit value list avoids the
    extra distinct-values scan, which matters on a 100 TB input."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(srnd(F.sum("o_totalprice"), 2))
    )
    return piv


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           count(*) AS n,
           floor((min(o_totalprice)) * 100.0 + 0.5) / 100.0 AS lo,
           floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0 AS hi
    FROM orders GROUP BY bin
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (B16-adjacent): bin =
    floor(price / 50000). Binning is a row-local projection, so the
    whole histogram is one partial-agg groupBy over ~tens of bins —
    the reduce side is trivially small at any corpus size (the
    canonical map-side-combine win).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("bin", F.floor(F.col("o_totalprice") / 50000))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            srnd(F.min("o_totalprice"), 2).alias("lo"),
            srnd(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_rf,
           grouping(l_linestatus) AS g_ls,
           count(*) AS n_rows,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (B19's general form — an arbitrary set
    list rather than CUBE's powerset): detail, per-flag subtotal, and
    grand total in one Expand + single agg pass, with grouping()
    indicators disambiguating NULL-as-subtotal from NULL data."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               count(*) AS n_rows,
               CAST(floor((sum(l_extendedprice)) * 100.0 + 0.5) AS DOUBLE) / 100.0 AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "q_hll_rollup",
    oracle="""
    WITH seg AS (
        SELECT l_returnflag, count(DISTINCT l_suppkey) AS seg_distinct
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT CAST((SELECT count(*) FROM seg) AS BIGINT) AS n_segments,
           CAST((SELECT count(DISTINCT l_suppkey) FROM lineitem) AS BIGINT)
               AS exact_distinct,
           CAST((SELECT sum(seg_distinct) FROM seg) AS BIGINT)
               AS naive_sum,
           CAST(1 AS BIGINT) AS union_within_5pct
    """,
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch rollup (B16 sibling, Spark 3.5
    datasketches): build one HLL sketch PER SEGMENT
    (hll_sketch_agg over each l_returnflag), then merge the segment
    sketches (hll_union_agg) and estimate global distinct suppliers —
    the pre-aggregated rollup-table pattern OLAP stores serve
    count-distinct from without rescanning raw data. The output
    carries the naive per-segment sum (which OVERCOUNTS shared
    suppliers — the bug sketches exist to avoid) and a
    union-within-5% gate against the exact count, so the oracle
    hash-checks the sketch's accuracy claim, not an
    engine-specific estimate.

    Scale shape: each segment sketch is a fixed-size binary built
    map-side (partial-aggregable); the union is a ~KB merge of 3
    sketches regardless of row count. At 100 TB the segment sketches
    persist in a rollup table and the union serves any segment
    combination without touching raw data — count distinct over an
    arbitrary slice becomes a metadata-sized read.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # ONE corpus pass (r14): collapse to the distinct (flag, suppkey)
    # pair frame first — HLL registers are duplicate-insensitive, so a
    # sketch built over distinct pairs is bit-identical to one built
    # over raw rows, seg_distinct is the per-flag pair count, and the
    # global exact distinct is a second tiny agg over the SAME frame.
    # The old shape scanned lineitem twice (each with an Expand-based
    # countDistinct rewrite doubling the aggregated rows).
    # no persist: pairs is exchange-rooted, so AQE ReusedExchange
    # dedups the two consumers at runtime without a cache.
    pairs = li.groupBy("l_returnflag", "l_suppkey").agg(F.lit(1))
    seg = pairs.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_suppkey").alias("sketch"),
        F.count("*").alias("seg_distinct"),
    )
    rolled = seg.agg(
        F.count("*").cast("long").alias("n_segments"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("__est"),
        F.sum("seg_distinct").cast("long").alias("naive_sum"),
    )
    exact = pairs.agg(
        F.countDistinct("l_suppkey").cast("long").alias("exact_distinct")
    )
    return rolled.crossJoin(F.broadcast(exact)).select(
        "n_segments",
        "exact_distinct",
        "naive_sum",
        (
            (
                F.abs(F.col("__est") - F.col("exact_distinct"))
                / F.col("exact_distinct")
            )
            <= F.lit(0.05)
        )
        .cast("long")
        .alias("union_within_5pct"),
    )
