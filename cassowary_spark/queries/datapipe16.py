"""Round-6 wave 18 (SURVEY.md §2): sequence and matching analytics —
gaps-and-islands activity streaks, period rank movers, weighted
quantiles, and blocked probabilistic record linkage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ----------------------------- C118 activity streaks (gaps & islands)

@query(
    "q_streaks",
    oracle=f"""
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ),
    isl AS (
        SELECT user_id,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d)
                   AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS streak_len
        FROM isl GROUP BY user_id, island
    ),
    best AS (
        SELECT user_id, CAST(max(streak_len) AS BIGINT) AS best_streak
        FROM streaks GROUP BY 1
    ),
    per AS (
        SELECT best_streak, CAST(count(*) AS BIGINT) AS n_users
        FROM best GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM per)
    SELECT best_streak, n_users,
           {sql_srnd("n_users * 1.0 / t", 6)} AS pct_users
    FROM per CROSS JOIN tot
    """,
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity streaks (C118): each user's longest run of CONSECUTIVE
    active days, via the gaps-and-islands idiom — day_index minus
    row_number is constant exactly within a consecutive run, so one
    subtraction turns runs into groupable island ids. The engagement
    statistic behind habit metrics (C50's cadence measures gap sizes;
    this measures unbroken runs), histogrammed by best streak.

    Determinism: day indexes are integer date diffs over DISTINCT
    (user, day) rows — row_number is unambiguous; everything after is
    counts.

    Scale shape: the DISTINCT and the row_number window share the
    user-keyed hash family; islands/best are two more partial aggs on
    the same key (no reshuffle — same partitioning), and the
    histogram key is bounded by the calendar. The island trick does
    in one window pass what a self-join formulation does in O(n²).
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(
            F.to_date("ts"), F.to_date(F.lit("2024-01-01"))
        ).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id", (F.col("d") - F.row_number().over(w)).alias("island")
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("streak_len")
    )
    best = streaks.groupBy("user_id").agg(
        F.max("streak_len").cast("long").alias("best_streak")
    )
    per = best.groupBy("best_streak").agg(
        F.count("*").cast("long").alias("n_users")
    )
    tot = per.agg(F.sum("n_users").cast("long").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "best_streak",
        "n_users",
        srnd(F.col("n_users") * 1.0 / F.col("t"), 6).alias("pct_users"),
    )


# ------------------------------------------ C119 period rank movers

@query(
    "q_rank_movers",
    oracle="""
    WITH per AS (
        SELECT l_partkey,
               CAST(sum(CASE WHEN year(l_shipdate) = 1996
                    THEN CAST(floor(l_extendedprice * 100.0 + 0.5)
                              AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS rev_a_cents,
               CAST(sum(CASE WHEN year(l_shipdate) = 1997
                    THEN CAST(floor(l_extendedprice * 100.0 + 0.5)
                              AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS rev_b_cents
        FROM lineitem
        WHERE year(l_shipdate) IN (1996, 1997)
        GROUP BY 1
        HAVING rev_a_cents > 0 AND rev_b_cents > 0
    ),
    ranked AS (
        SELECT l_partkey, rev_a_cents, rev_b_cents,
               CAST(row_number() OVER (ORDER BY rev_a_cents DESC,
                    l_partkey ASC) AS BIGINT) AS rank_a,
               CAST(row_number() OVER (ORDER BY rev_b_cents DESC,
                    l_partkey ASC) AS BIGINT) AS rank_b
        FROM per
    )
    SELECT l_partkey AS partkey, rev_a_cents, rev_b_cents,
           rank_a, rank_b,
           CAST(rank_a - rank_b AS BIGINT) AS rank_climb
    FROM ranked
    ORDER BY rank_a - rank_b DESC, l_partkey ASC
    LIMIT 10
    """,
)
def q_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period rank movers (C119): parts active in BOTH periods,
    ranked by revenue within each period, top-10 by rank climb —
    the leaderboard-delta view merchandising teams read (C82 diffs
    values; this diffs POSITIONS, which is what "mover" means when
    the whole market grows).

    Determinism: ranks are row_number over (revenue DESC, partkey) —
    total orders, no tie ambiguity; the top-10 cut orders by
    (climb DESC, partkey).

    Scale shape: one partkey conditional-sum partial agg (year
    predicate pushed to the scan), then two global ranked windows
    over the catalog-sized frame via operators/ranks
    ``catalog_positions`` (r13: the centralized bounded-window form;
    same single-sort caveat and evolution as C111 — catalog ≪ facts;
    range-partitioned sort) — then a TakeOrdered(10), never a full
    result sort.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1996, 1997)
    )
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    per = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.year("l_shipdate") == 1996, cents).otherwise(0))
            .cast("long")
            .alias("rev_a_cents"),
            F.sum(F.when(F.year("l_shipdate") == 1997, cents).otherwise(0))
            .cast("long")
            .alias("rev_b_cents"),
        )
        .filter((F.col("rev_a_cents") > 0) & (F.col("rev_b_cents") > 0))
    )
    from cassowary_spark.operators.ranks import catalog_positions

    ranked = catalog_positions(
        catalog_positions(
            per, [F.desc("rev_a_cents"), F.asc("l_partkey")], "rank_a"
        ),
        [F.desc("rev_b_cents"), F.asc("l_partkey")],
        "rank_b",
    )
    return (
        ranked.select(
            F.col("l_partkey").alias("partkey"),
            "rev_a_cents",
            "rev_b_cents",
            "rank_a",
            "rank_b",
            (F.col("rank_a") - F.col("rank_b")).cast("long").alias(
                "rank_climb"
            ),
        )
        .orderBy(F.desc("rank_climb"), F.asc("partkey"))
        .limit(10)
    )


# -------------------------------------- C120 weighted quantiles

@query(
    "q_weighted_median",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   AS price_c,
               CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS w
        FROM lineitem
    ),
    byp AS (
        SELECT flag, price_c, CAST(sum(w) AS BIGINT) AS w
        FROM v GROUP BY 1, 2
    ),
    c AS (
        SELECT flag, price_c, w,
               CAST(sum(w) OVER (PARTITION BY flag ORDER BY price_c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_w,
               CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tot_w
        FROM byp
    )
    SELECT flag, CAST(max(tot_w) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cum_w >= tot_w THEN price_c END)
                AS BIGINT) AS wmedian_cents,
           CAST(min(CASE WHEN 10 * cum_w >= 9 * tot_w THEN price_c END)
                AS BIGINT) AS wp90_cents
    FROM c GROUP BY 1
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted quantiles (C120): the quantity-weighted median and p90
    of unit prices per return flag — "the price at which half the
    VOLUME trades", which a row-weighted median (B18) misstates
    whenever cheap items ship in bulk. Type-1 (lower-value) estimator:
    the smallest price whose cumulative weight reaches the target.

    Determinism: weights and prices are integer centi-units; the
    quantile cut is the integer cross-multiplication 2·cum ≥ tot
    (10·cum ≥ 9·tot for p90) — no float thresholds, and min() over
    qualifying prices is order-insensitive.

    Scale shape: duplicate prices pre-collapse in a (flag, price)
    partial agg BEFORE the window, so the per-flag ordered pass runs
    over distinct prices only; the cumulative weight comes from
    operators/ranks ``doubled_midranks``' shared window (its cum_col
    output — r13: the centralized counts-frame discipline) and the
    per-flag total window shares the same flag-partitioned sort.
    Price-quantized buckets would bound the pass further at 100 TB,
    exactly like C106's bands.
    """
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
        .cast("long")
        .alias("price_c"),
        F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long").alias("w"),
    )
    byp = v.groupBy("flag", "price_c").agg(
        F.sum("w").cast("long").alias("w")
    )
    from cassowary_spark.operators.ranks import doubled_midranks

    wt = Window.partitionBy("flag")
    c = doubled_midranks(
        byp, "price_c", "w", group_cols=["flag"], cum_col="cum_w"
    ).withColumn("tot_w", F.sum("w").over(wt).cast("long"))
    return c.groupBy("flag").agg(
        F.max("tot_w").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cum_w") >= F.col("tot_w"), F.col("price_c"))
        )
        .cast("long")
        .alias("wmedian_cents"),
        F.min(
            F.when(
                10 * F.col("cum_w") >= 9 * F.col("tot_w"), F.col("price_c")
            )
        )
        .cast("long")
        .alias("wp90_cents"),
    )


# --------------------------------- C121 probabilistic record linkage

@query(
    "q_record_linkage",
    oracle="""
    WITH c AS (
        SELECT c_custkey AS id, c_nationkey AS nat,
               c_mktsegment AS seg,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c
        FROM customer
    ),
    b AS (SELECT id, nat, seg, bal_c, bal_c // 50000 AS blk FROM c),
    pairs AS (
        SELECT (CASE WHEN a.seg = b2.seg THEN 18 ELSE -7 END
              + CASE WHEN abs(a.bal_c - b2.bal_c) <= 10000
                     THEN 22 ELSE -12 END) AS score
        FROM b a JOIN b b2
          ON b2.nat = a.nat AND b2.blk = a.blk AND a.id < b2.id
    ),
    cls AS (
        SELECT score,
               CASE WHEN score >= 30 THEN 'match'
                    WHEN score >= 6 THEN 'possible'
                    ELSE 'non_match' END AS verdict
        FROM pairs
    )
    SELECT score, verdict, CAST(count(*) AS BIGINT) AS n_pairs
    FROM cls GROUP BY 1, 2
    """,
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked probabilistic record linkage (C121): Fellegi-Sunter-
    shaped pair scoring — candidate pairs from a blocking key
    (nation × $500 balance band), per-field agreement weights
    (+18/−7 segment, +22/−12 balance-within-$100), thresholded into
    match / possible / non-match — the multi-field generalization of
    B13d's single-field fuzzy join, emitted as a score histogram.
    Blocking trades recall for tractability by construction (a true
    pair straddling a band boundary is never considered — the
    documented cost of any blocked linkage).

    Determinism: weights, scores and thresholds are integers; the
    histogram is pure counts.

    Scale shape: the self-join is equi-keyed on the composite block —
    a shuffle hash join whose cost is Σ block² over block sizes, never
    corpus²; the blocking key is chosen so band cardinality grows with
    data (balance range × nations), keeping blocks bounded; hot
    blocks shard under AQE skew handling. Same candidate-generation
    discipline as C2's LSH bands and C105's grid cells.
    """
    cst = load_table(spark, sf_dir, "customer")
    c = cst.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long").alias(
            "bal_c"
        ),
    ).withColumn("blk", F.expr("bal_c div 50000"))
    a = c.select(
        F.col("id").alias("a_id"),
        F.col("nat").alias("a_nat"),
        F.col("seg").alias("a_seg"),
        F.col("bal_c").alias("a_bal"),
        F.col("blk").alias("a_blk"),
    )
    b = c.select(
        F.col("id").alias("b_id"),
        F.col("nat").alias("b_nat"),
        F.col("seg").alias("b_seg"),
        F.col("bal_c").alias("b_bal"),
        F.col("blk").alias("b_blk"),
    )
    pairs = a.join(
        b,
        (F.col("a_nat") == F.col("b_nat"))
        & (F.col("a_blk") == F.col("b_blk"))
        & (F.col("a_id") < F.col("b_id")),
    ).select(
        (
            F.when(F.col("a_seg") == F.col("b_seg"), 18).otherwise(-7)
            + F.when(
                F.abs(F.col("a_bal") - F.col("b_bal")) <= 10000, 22
            ).otherwise(-12)
        ).alias("score")
    )
    cls = pairs.select(
        "score",
        F.when(F.col("score") >= 30, "match")
        .when(F.col("score") >= 6, "possible")
        .otherwise("non_match")
        .alias("verdict"),
    )
    return cls.groupBy("score", "verdict").agg(
        F.count("*").cast("long").alias("n_pairs")
    )
