"""Round-6 wave 12 (SURVEY.md §2): master-data survivorship merge,
period-over-period mover analysis, and equi-depth histogram
construction — the MDM / BI-diff / optimizer-statistics trio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# -------------------------------------- C81b survivorship (golden record)


@query(
    "q_survivorship",
    oracle="""
    WITH variants AS (
        SELECT o_custkey AS custkey, o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE 'seg-' || CAST(o_custkey % 7 AS VARCHAR) END
                   AS segment,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   END AS last_cents,
               o_orderdate AS seen_at
        FROM orders
    )
    SELECT custkey,
           count(*) AS n_variants,
           arg_max(segment, CASE WHEN segment IS NULL THEN -1
                                 ELSE o_orderkey END) AS segment,
           arg_max(last_cents, CASE WHEN last_cents IS NULL THEN -1
                                    ELSE o_orderkey END) AS last_cents,
           max(seen_at) AS last_seen
    FROM variants GROUP BY 1
    """,
)
def q_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge / golden record (C81b): collapse each
    entity's record variants (here: per-order snapshots of a customer,
    with planted NULL fields) into ONE master row where every field
    independently takes its latest NON-NULL value — the MDM
    field-level survivorship rule (C14 merges whole rows; SCD2 keeps
    history; this builds the current golden record when different
    sources know different fields).

    Expressed with max_by/arg_max per field, keyed so NULL variants
    rank below every real one (priority −1) and recency breaks the
    rest — the per-field "latest wins" in ONE pass, no joins, no
    windows. Priorities are unique per key (orderkey), so arg_max is
    deterministic on both engines.

    Scale shape: a single entity-keyed partial-agg groupBy; every
    arg_max combines map-side like any min/max. At 100 TB this is the
    cheapest possible shape for the operation — one shuffle of one
    row per variant, output one row per entity.
    """
    o = load_table(spark, sf_dir, "orders")
    variants = o.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("seg-"), (F.col("o_custkey") % 7).cast("string"))
        ).alias("segment"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
                "long"
            )
        ).alias("last_cents"),
        F.col("o_orderdate").alias("seen_at"),
    )
    pri_seg = F.when(F.col("segment").isNull(), F.lit(-1)).otherwise(
        F.col("o_orderkey")
    )
    pri_cents = F.when(F.col("last_cents").isNull(), F.lit(-1)).otherwise(
        F.col("o_orderkey")
    )
    return variants.groupBy("custkey").agg(
        F.count("*").alias("n_variants"),
        F.max_by("segment", pri_seg).alias("segment"),
        F.max_by("last_cents", pri_cents).alias("last_cents"),
        F.max("seen_at").alias("last_seen"),
    )


# ---------------------------------------- C82 period-over-period movers


@query(
    "q_period_movers",
    oracle=f"""
    WITH split AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 0 ELSE 1 END AS half,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_p0,
           CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_p1,
           CAST(sum(CASE WHEN half = 0 THEN cents ELSE 0 END) AS BIGINT)
               AS cents_p0,
           CAST(sum(CASE WHEN half = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS cents_p1,
           {sql_srnd(
               "(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)"
               " - sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)) * 100.0"
               " / sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)", 4)}
               AS pct_change
    FROM split GROUP BY 1
    """,
)
def q_period_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period movers (C82): per event type, both halves'
    counts and value mass side by side with the percent change — the
    BI diff every dashboard renders ("what moved since last period"),
    computed in ONE pass with conditional aggregates instead of the
    naive two-scans-plus-self-join.

    Scale shape: the period tag is a row-local comparison against a
    literal boundary; ALL six measures ride one 5-key partial-agg
    groupBy (conditional sums combine map-side). Money and counts are
    integer-exact; only the final percent is floating, srnd'd, and
    derived from exact integers — so it is the same IEEE op sequence
    on both engines. A type absent from period 0 yields NULL percent
    (try_divide here, DuckDB's native NULL-on-zero-division there)
    instead of an ANSI abort.
    """
    ev = load_table(spark, sf_dir, "events")
    half = F.when(
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), 0
    ).otherwise(1)
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    s = ev.select("event_type", half.alias("half"), cents.alias("cents"))
    agg = s.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_p0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_p1"),
        F.sum(F.when(F.col("half") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("cents_p0"),
        F.sum(F.when(F.col("half") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("cents_p1"),
    )
    return agg.select(
        "event_type",
        "n_p0",
        "n_p1",
        "cents_p0",
        "cents_p1",
        srnd(
            F.try_divide(
                (F.col("n_p1") - F.col("n_p0")) * F.lit(100.0),
                F.col("n_p0"),
            ),
            4,
        ).alias("pct_change"),
    )


# ------------------------------------------ C83 equi-depth histogram

_EQD_BINS = 10


@query(
    "q_equidepth_hist",
    oracle=f"""
    WITH cells AS (
        SELECT l_extendedprice AS v, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT v, cnt,
               CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS tot
        FROM cells
    ),
    binned AS (
        SELECT CAST(1 + ((cum - 1) * {_EQD_BINS}) // tot AS INT) AS bin,
               v, cnt
        FROM cum
    )
    SELECT bin,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           {sql_srnd("min(v)", 4)} AS lo,
           {sql_srnd("max(v)", 4)} AS hi
    FROM binned GROUP BY 1
    """,
)
def q_equidepth_hist(
    spark: SparkSession, sf_dir: str, *, approx: bool = False
) -> DataFrame:
    """Equi-depth histogram (C83): {n} near-equal-count bins over
    l_extendedprice with per-bin bounds — the histogram a cost-based
    optimizer stores (ANALYZE ... FOR COLUMNS) and the skew-aware
    sibling of B22c's fixed-width binning: bin WIDTH adapts so each
    holds (close to) the same row count, which is what makes
    selectivity estimates robust to skew.

    Semantics (r11 re-authoring, the q_mann_whitney precedent): the
    cut is TIES-TOGETHER — operators/ranks.counts_bands assigns every
    tie group whole to bin 1 + ((cum−1)·{n}) div N over the
    distinct-value counts frame, exactly what equi-height histograms
    store (a value never straddles two buckets). Tie-invariant: no
    positional tiebreak column exists, so the result is a pure
    function of the value multiset.

    Determinism: exact BIGINT cumulative counts and integer division
    on both engines; lo/hi are srnd4-quantized mins/maxes of exact
    parquet doubles — no engine-dependent float path.

    Scale shape: ONE map-side-combining groupBy collapses the corpus
    to its value cells (integer-cents quantization bounds the domain
    regardless of row count — ≤ ~10⁷ cells at any scale); the banding
    window runs over THAT frame only (sp_corpus_windows = 0); the
    rollup is a {n}-key partial agg. No corpus sort or corpus window
    anywhere — this exact form IS the 100 TB form. ``approx=True``
    keeps the sketch-boundary variant (approx_percentile cuts +
    row-local bucketing, operators/quantiles.with_approx_ntiles) for
    pipelines that prefer zero value-shuffle over cell exactness;
    per-bin mass agreement pinned in tests/test_quantiles.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    if approx:
        from cassowary_spark.operators.quantiles import with_approx_ntiles

        binned = with_approx_ntiles(
            li.select(F.col("l_extendedprice").alias("v")),
            [("bin", F.col("v"), _EQD_BINS)],
        )
        return binned.groupBy("bin").agg(
            F.count("*").alias("n_rows"),
            srnd(F.min("v"), 4).alias("lo"),
            srnd(F.max("v"), 4).alias("hi"),
        )
    from cassowary_spark.operators.ranks import counts_bands

    cells = li.groupBy(F.col("l_extendedprice").alias("v")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    binned = counts_bands(cells, "v", "cnt", _EQD_BINS, out_col="bin")
    return binned.groupBy("bin").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        srnd(F.min("v"), 4).alias("lo"),
        srnd(F.max("v"), 4).alias("hi"),
    )


q_equidepth_hist.__doc__ = q_equidepth_hist.__doc__.format(n=_EQD_BINS)
