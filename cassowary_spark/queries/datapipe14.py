"""Round-6 wave 16 (SURVEY.md §2): pipeline-health and revenue-mix
analytics — join-fanout audit, winsorized means, cohort LTV curves,
ABC classification, new-vs-returning decomposition.

Same discipline as wave 15: integer cents / month indexes / counts
end-to-end, one srnd-quantized division per emitted ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------- C108 join-fanout audit

@query(
    "q_join_fanout_audit",
    oracle=f"""
    WITH cnt AS (
        SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1
    ),
    fan AS (
        SELECT coalesce(c.n, 0) AS fanout
        FROM orders o LEFT JOIN cnt c ON c.l_orderkey = o.o_orderkey
    ),
    per AS (
        SELECT CAST(fanout AS BIGINT) AS fanout,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM fan GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_keys) AS BIGINT) AS t FROM per)
    SELECT fanout, n_keys,
           {sql_srnd("n_keys * 1.0 / t", 6)} AS pct_keys
    FROM per CROSS JOIN tot
    """,
)
def q_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-fanout audit (C108): for the orders→lineitem key, the
    distribution of per-key match counts INCLUDING zero-match keys —
    the cardinality profile a planner (or a reviewer) reads before
    trusting a join: a long fanout tail predicts blowup, a zero bucket
    reveals referential gaps that an inner join would silently drop.

    Determinism: fanouts are counts; the one percentage divides two
    exact BIGINTs.

    Scale shape: the fact side collapses to (key, count) partials
    BEFORE the join, so the LEFT JOIN moves one row per key, not one
    per match; both sides hash on the same key (one shuffle family);
    the fanout census is a small-key partial agg and the total is a
    1-row broadcast. Never materializes the joined fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cnt = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    fan = o.join(
        cnt, o["o_orderkey"] == cnt["l_orderkey"], "left"
    ).select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("fanout"))
    per = fan.groupBy("fanout").agg(F.count("*").cast("long").alias("n_keys"))
    # census is fanout-domain-bounded: pack it into one row so the
    # total and the share compute row-locally (no second agg +
    # broadcast ladder over the tiny frame)
    packed = per.agg(
        F.expr("array_sort(collect_list(struct(fanout, n_keys)))").alias(
            "cs"
        )
    ).select("cs", F.expr("aggregate(cs, 0L, (a, c) -> a + c.n_keys)").alias("t"))
    return packed.select(
        F.explode("cs").alias("c"), F.col("t")
    ).select(
        F.col("c.fanout").alias("fanout"),
        F.col("c.n_keys").alias("n_keys"),
        srnd(F.col("c.n_keys") * 1.0 / F.col("t"), 6).alias("pct_keys"),
    )


# ---------------------------------------- C109 winsorized means

@query(
    "q_winsorize",
    oracle=f"""
    WITH c AS (
        SELECT o_orderstatus AS status,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    b AS (
        SELECT status,
               CAST(floor(quantile_cont(cents, 0.05) + 0.5) AS BIGINT)
                   AS q05c,
               CAST(floor(quantile_cont(cents, 0.95) + 0.5) AS BIGINT)
                   AS q95c
        FROM c GROUP BY 1
    ),
    j AS (
        SELECT c.status, c.cents, b.q05c, b.q95c,
               greatest(b.q05c, least(b.q95c, c.cents)) AS wcents
        FROM c JOIN b ON b.status = c.status
    ),
    per AS (
        SELECT status,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_raw,
               CAST(sum(wcents) AS BIGINT) AS sum_wins,
               CAST(sum(CASE WHEN cents < q05c THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_lo,
               CAST(sum(CASE WHEN cents > q95c THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_hi,
               CAST(max(q05c) AS BIGINT) AS q05c,
               CAST(max(q95c) AS BIGINT) AS q95c
        FROM j GROUP BY 1
    )
    SELECT status, n_rows, q05c, q95c, n_clipped_lo, n_clipped_hi,
           {sql_srnd("sum_raw * 1.0 / n_rows", 2)} AS mean_raw_cents,
           {sql_srnd("sum_wins * 1.0 / n_rows", 2)} AS mean_wins_cents
    FROM per
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized means (C109): per order status, the mean order value
    before and after clipping to the group's [p05, p95] — the
    outlier-robust statistic a metrics pipeline reports next to the
    raw mean (C57 flags outliers; this quantifies their pull). Clip
    counts per tail come along for free.

    Determinism: percentile bounds are the exact interpolated form
    (Spark `percentile` ≡ DuckDB `quantile_cont`, the B18 idiom),
    half-up-quantized to INTEGER cents before clipping — so clipped
    values are integers and both sums are exact BIGINTs in any
    aggregation order.

    Scale shape: classic two-pass winsorization — pass 1 computes the
    per-group bounds (groupBy agg, tiny result), pass 2 re-joins the
    bounds by broadcast (group cardinality is small by construction)
    and clips row-locally into a second partial agg. At 100 TB the
    exact percentile in pass 1 swaps for approx_percentile as
    documented in B18; the clip/agg pass is unchanged.
    """
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    b = c.groupBy("status").agg(
        F.floor(F.expr("percentile(cents, 0.05)") + 0.5)
        .cast("long")
        .alias("q05c"),
        F.floor(F.expr("percentile(cents, 0.95)") + 0.5)
        .cast("long")
        .alias("q95c"),
    )
    j = c.join(F.broadcast(b), "status").withColumn(
        "wcents",
        F.greatest(F.col("q05c"), F.least(F.col("q95c"), F.col("cents"))),
    )
    per = j.groupBy("status").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_raw"),
        F.sum("wcents").cast("long").alias("sum_wins"),
        F.sum(F.when(F.col("cents") < F.col("q05c"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_lo"),
        F.sum(F.when(F.col("cents") > F.col("q95c"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_hi"),
        F.max("q05c").cast("long").alias("q05c"),
        F.max("q95c").cast("long").alias("q95c"),
    )
    return per.select(
        "status",
        "n_rows",
        "q05c",
        "q95c",
        "n_clipped_lo",
        "n_clipped_hi",
        srnd(F.col("sum_raw") * 1.0 / F.col("n_rows"), 2).alias(
            "mean_raw_cents"
        ),
        srnd(F.col("sum_wins") * 1.0 / F.col("n_rows"), 2).alias(
            "mean_wins_cents"
        ),
    )


# ------------------------------------------- C110 cohort LTV curve

@query(
    "q_cohort_ltv",
    oracle=f"""
    WITH fm AS (
        SELECT o_custkey,
               min(year(o_orderdate) * 12 + month(o_orderdate)) AS cm,
               strftime(min(o_orderdate), '%Y-%m') AS cohort_month
        FROM orders GROUP BY 1
    ),
    sizes AS (
        SELECT cohort_month, CAST(count(*) AS BIGINT) AS cohort_size
        FROM fm GROUP BY 1
    ),
    rev AS (
        SELECT f.cohort_month,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - f.cm
                    AS BIGINT) AS age_months,
               CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders o JOIN fm f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort_month, age_months, rev_cents,
               CAST(sum(rev_cents) OVER (PARTITION BY cohort_month
                   ORDER BY age_months
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_rev_cents
        FROM rev
    )
    SELECT c.cohort_month, c.age_months, s.cohort_size,
           c.rev_cents, c.cum_rev_cents,
           {sql_srnd("c.cum_rev_cents * 1.0 / s.cohort_size", 2)}
               AS avg_ltv_cents
    FROM cum c JOIN sizes s ON s.cohort_month = c.cohort_month
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves (C110): per acquisition-month cohort, the
    cumulative revenue at each cohort age in months, divided by cohort
    size — the average-lifetime-value trajectory that prices
    acquisition spend. C51's retention says who came BACK; this says
    what they were WORTH, cumulatively.

    Determinism: cohort and age are integer month indexes
    (year·12+month) so month arithmetic never touches date
    formatting; revenue is integer cents; the cumulative window is an
    exact BIGINT running sum over a deterministic (cohort, age)
    order. Only observed (cohort, age) cells are emitted (a
    zero-revenue month between two active ones is simply absent — the
    curve is a step function either way).

    Scale shape: one custkey partial agg for cohorts, one custkey
    equi-join (same hash family as the agg), one (cohort, age) agg —
    calendar-bounded cardinality (months², ~6.4k cells for 6.5
    years) — then a per-cohort running window over ≤80 rows each and
    a broadcast join to the ≤80-row sizes frame. Everything after the
    first shuffle is calendar-sized, independent of order volume.
    """
    o = load_table(spark, sf_dir, "orders")
    midx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    fm = o.groupBy("o_custkey").agg(
        F.min(midx).alias("cm"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias(
            "cohort_month"
        ),
    )
    sizes = fm.groupBy("cohort_month").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    rev = (
        o.join(fm, "o_custkey")
        .groupBy(
            "cohort_month",
            (midx - F.col("cm")).cast("long").alias("age_months"),
        )
        .agg(F.sum(cents).cast("long").alias("rev_cents"))
    )
    w = Window.partitionBy("cohort_month").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.withColumn(
        "cum_rev_cents", F.sum("rev_cents").over(w).cast("long")
    )
    return cum.join(F.broadcast(sizes), "cohort_month").select(
        "cohort_month",
        "age_months",
        "cohort_size",
        "rev_cents",
        "cum_rev_cents",
        srnd(
            F.col("cum_rev_cents") * 1.0 / F.col("cohort_size"), 2
        ).alias("avg_ltv_cents"),
    )


# -------------------------------------- C111 ABC classification

@query(
    "q_abc_classification",
    oracle=f"""
    WITH per AS (
        SELECT l_partkey,
               CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                    AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS t FROM per),
    cum AS (
        SELECT l_partkey, rev_cents,
               CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC,
                   l_partkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_cents,
               t
        FROM per CROSS JOIN tot
    ),
    cls AS (
        SELECT CASE WHEN cum_cents * 5 <= t * 4 THEN 'A'
                    WHEN cum_cents * 20 <= t * 19 THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev_cents, t
        FROM cum
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS class_cents,
           {sql_srnd("sum(rev_cents) * 1.0 / max(t)", 6)} AS rev_share
    FROM cls GROUP BY 1
    """,
)
def q_abc_classification(
    spark: SparkSession, sf_dir: str, *, approx: bool = False
) -> DataFrame:
    """ABC classification (C111): parts ranked by revenue, classified
    A (first 80% of cumulative revenue), B (next 15%), C (tail) —
    the inventory-management Pareto cut. C101's Gini measures HOW
    concentrated; this hands back WHICH items carry the mass.

    Determinism: class boundaries are integer cross-multiplications
    (cum·5 ≤ T·4, cum·20 ≤ T·19) — no float shares at the decision
    point, so a part sitting exactly on 80% classifies identically
    in both engines; the cumulative order is (revenue DESC, partkey)
    — total and engine-stable.

    Scale shape: one partkey partial agg, a 1-row total broadcast,
    then a global ranked running sum. The global window is the
    honest cost: at catalog scale (parts ≪ facts — 20M parts for
    100 TB of facts) a range-partitioned sort handles it.
    ``approx=True`` SHIPS the boundary-precompute evolution (r10):
    revenues collapse into geometric bins, the tiny bin frame
    (≤ ~5.7k rows at any scale — ln(2⁶³)·128 ids) carries the one
    DESC running share, and each bin's WHOLE part population
    classifies by the bin boundary — a broadcast compare, row-local
    after the bin agg, no catalog-sized window anywhere. Divergence
    from exact: the parts inside the two boundary BINS classify with
    their bin (the ties-together convention of with_approx_ntiles);
    tests/test_ranks.py bounds the class-mass drift by the boundary
    bins' mass. The exact form stays the default (oracle contract).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    per = li.groupBy("l_partkey").agg(
        F.sum(cents).cast("long").alias("rev_cents")
    )
    tot = per.agg(F.sum("rev_cents").cast("long").alias("t"))
    if approx:
        # geometric bins: ≤ ~5.7k ids over the whole int64 range
        # (log1p * 128), so the running share runs over a frame
        # whose size is scale-INDEPENDENT
        b = (
            F.floor(F.log1p(F.col("rev_cents").cast("double")) * 128.0)
            .cast("long")
            .alias("bin")
        )
        bins = per.select(b, "rev_cents").groupBy("bin").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("rev_cents").cast("long").alias("s"),
        )
        wb = Window.orderBy(F.desc("bin")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cumb = bins.crossJoin(F.broadcast(tot)).withColumn(
            "cum", F.sum("s").over(wb).cast("long")
        )
        cls_a = cumb.select(
            F.when(F.col("cum") * 5 <= F.col("t") * 4, "A")
            .when(F.col("cum") * 20 <= F.col("t") * 19, "B")
            .otherwise("C")
            .alias("abc_class"),
            "n",
            "s",
            "t",
        )
        return cls_a.groupBy("abc_class").agg(
            F.sum("n").cast("long").alias("n_parts"),
            F.sum("s").cast("long").alias("class_cents"),
            srnd(F.sum("s") * 1.0 / F.max("t"), 6).alias("rev_share"),
        )
    w = Window.orderBy(
        F.desc("rev_cents"), F.asc("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per.crossJoin(F.broadcast(tot)).withColumn(
        "cum_cents", F.sum("rev_cents").over(w).cast("long")
    )
    cls = cum.select(
        F.when(F.col("cum_cents") * 5 <= F.col("t") * 4, "A")
        .when(F.col("cum_cents") * 20 <= F.col("t") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_cents",
        "t",
    )
    return cls.groupBy("abc_class").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("rev_cents").cast("long").alias("class_cents"),
        srnd(F.sum("rev_cents") * 1.0 / F.max("t"), 6).alias("rev_share"),
    )


# --------------------------------- C112 new vs returning split

@query(
    "q_new_vs_returning",
    oracle=f"""
    WITH fm AS (
        SELECT o_custkey,
               min(year(o_orderdate) * 12 + month(o_orderdate)) AS cm
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
               CASE WHEN year(o.o_orderdate) * 12 + month(o.o_orderdate)
                         = f.cm THEN 1 ELSE 0 END AS is_new,
               CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS cents
        FROM orders o JOIN fm f ON f.o_custkey = o.o_custkey
    ),
    per AS (
        SELECT month,
               CAST(sum(is_new) AS BIGINT) AS n_new,
               CAST(sum(1 - is_new) AS BIGINT) AS n_returning,
               CAST(sum(CASE WHEN is_new = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS rev_new_cents,
               CAST(sum(CASE WHEN is_new = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS rev_ret_cents
        FROM t GROUP BY 1
    )
    SELECT month, n_new, n_returning, rev_new_cents, rev_ret_cents,
           {sql_srnd("n_new * 1.0 / (n_new + n_returning)", 6)}
               AS new_share
    FROM per
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning decomposition (C112): each month's orders and
    revenue split by whether the order falls in its customer's
    acquisition month — the growth-accounting lens that separates
    "we acquired" from "we retained" in every top-line move. Pairs
    with C110 (the value of each acquired cohort) and C82 (the
    undecomposed month-over-month diff).

    Determinism: acquisition comparison is on integer month indexes;
    counts and cents are exact; one srnd'd share per month.

    Scale shape: one custkey partial agg for first months, one
    custkey equi-join sharing its hash, then a month-keyed partial
    agg (calendar cardinality). The is_new flag is row-local after
    the join — no window, no second pass over facts.
    """
    o = load_table(spark, sf_dir, "orders")
    midx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    fm = o.groupBy("o_custkey").agg(F.min(midx).alias("cm"))
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    t = o.join(fm, "o_custkey").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.when(midx == F.col("cm"), 1).otherwise(0).alias("is_new"),
        cents.alias("cents"),
    )
    per = t.groupBy("month").agg(
        F.sum("is_new").cast("long").alias("n_new"),
        F.sum(1 - F.col("is_new")).cast("long").alias("n_returning"),
        F.sum(F.when(F.col("is_new") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("rev_new_cents"),
        F.sum(F.when(F.col("is_new") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("rev_ret_cents"),
    )
    return per.select(
        "month",
        "n_new",
        "n_returning",
        "rev_new_cents",
        "rev_ret_cents",
        srnd(
            F.col("n_new") * 1.0 / (F.col("n_new") + F.col("n_returning")),
            6,
        ).alias("new_share"),
    )
