"""Round-6 wave 11 (SURVEY.md §2): customer/behavior analytics —
RFM segmentation, top event paths, and A/B lift with a z-statistic.
The classic marketing-analytics trio a warehouse serves daily, each
expressed with the repo's determinism idioms (integer cents, ntile
with explicit tiebreaks, srnd'd test statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# --------------------------------------------- C78 RFM segmentation

_RFM_ANCHOR = "1998-12-01"  # first day after the fixture's order range


@query(
    "q_rfm_segmentation",
    oracle=f"""
    WITH rfm AS (
        SELECT o_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         DATE '{_RFM_ANCHOR}') AS rec_days,
               count(*) AS freq,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    scored AS (
        SELECT o_custkey, cents,
               ntile(5) OVER (ORDER BY rec_days DESC, o_custkey) AS r_q,
               ntile(5) OVER (ORDER BY freq, o_custkey) AS f_q,
               ntile(5) OVER (ORDER BY cents, o_custkey) AS m_q
        FROM rfm
    )
    SELECT CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
               || CAST(m_q AS VARCHAR) AS segment,
           count(*) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS cents_sum
    FROM scored GROUP BY 1
    """,
)
def q_rfm_segmentation(
    spark: SparkSession, sf_dir: str, *, approx: bool = False
) -> DataFrame:
    """RFM segmentation (C78): per-customer Recency (days since last
    order at a fixed anchor), Frequency (order count), Monetary
    (integer cents), each quintiled with ntile(5), concatenated into
    the classic 3-digit segment (555 = best) and rolled up — the
    marketing-warehouse workhorse for lifecycle campaigns.

    Determinism: every ntile orders by (metric, custkey) — a strict
    total order, so bucket boundaries are engine-stable; recency
    ranks DESC so score 5 = most recent on both engines; money is
    integer cents end-to-end.

    Scale shape: the RFM frame is ONE custkey-keyed partial agg (one
    row per customer). The exact path's three ntiles are
    unpartitioned windows — fine while the customer frame fits a
    task; ``approx=True`` is the 10⁹-customer production path: ONE
    ``approx_percentile`` sketch pass yields all three quintile
    threshold arrays (operators/quantiles.with_approx_ntiles), they
    broadcast as one row, and scoring becomes row-local — no window,
    no global sort. Same segments up to sketch error and boundary
    ties (tests/test_quantiles.py pins the agreement); the exact
    form stays the default because the oracle must be bit-checkable.
    The segment rollup is a ≤125-key partial agg either way.
    """
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_RFM_ANCHOR).cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("rec_days"),
        F.count("*").alias("freq"),
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
                "long"
            )
        ).alias("cents"),
    )
    if approx:
        from cassowary_spark.operators.quantiles import with_approx_ntiles

        # rec_days ranks DESC in the exact form (bucket 1 = oldest),
        # so its ascending approx metric is the negation
        bucketed = with_approx_ntiles(
            rfm,
            [
                ("r_q", -F.col("rec_days"), 5),
                ("f_q", F.col("freq"), 5),
                ("m_q", F.col("cents"), 5),
            ],
        )
        scored = bucketed.select(
            "cents",
            F.concat(
                F.col("r_q").cast("string"),
                F.col("f_q").cast("string"),
                F.col("m_q").cast("string"),
            ).alias("segment"),
        )
    else:
        r_q = F.ntile(5).over(
            Window.orderBy(F.desc("rec_days"), F.asc("o_custkey"))
        )
        f_q = F.ntile(5).over(Window.orderBy(F.asc("freq"), F.asc("o_custkey")))
        m_q = F.ntile(5).over(Window.orderBy(F.asc("cents"), F.asc("o_custkey")))
        scored = rfm.select(
            "cents",
            F.concat(
                r_q.cast("string"), f_q.cast("string"), m_q.cast("string")
            ).alias("segment"),
        )
    return scored.groupBy("segment").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("cents_sum"),
    )


# ------------------------------------------------ C79 top event paths

_PATH_LEN = 5


@query(
    "q_event_paths",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= {_PATH_LEN}
        GROUP BY user_id
    )
    SELECT path, count(*) AS n_users
    FROM paths GROUP BY 1 HAVING count(*) >= 2
    """,
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event paths (C79): each user's first {n} events as an
    ordered `a>b>c` journey string, counted across users (paths shared
    by ≥2 users) — the path-analysis primitive behind sankey funnels
    and "how do users actually reach purchase" questions; C52's funnel
    checks ONE prescribed path, this surfaces the empirical ones.

    Scale shape: the prefix cut is one user-keyed row_number window;
    path assembly folds the SAME rows grouped by the SAME key (the
    groupBy reuses the window's hash partitioning — no extra
    exchange) in explicit rn order via array_sort, never relying on
    row arrival order; the path rollup shuffles one short string per
    user. HAVING bounds the output to recurring journeys.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _PATH_LEN
    )
    paths = ranked.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(rn, "
            "event_type))), x -> x.event_type), '>')"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .filter(F.col("n_users") >= 2)
    )


q_event_paths.__doc__ = q_event_paths.__doc__.format(n=_PATH_LEN)

# ------------------------------------------------------- C80 A/B lift


@query(
    "q_ab_lift",
    oracle=f"""
    WITH assign AS (
        SELECT DISTINCT user_id, user_id % 2 AS arm FROM events
    ),
    conv AS (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        GROUP BY 1 HAVING count(*) >= 14
    ),
    arms AS (
        SELECT a.arm,
               count(*) AS n_users,
               CAST(sum(CASE WHEN c.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
        GROUP BY 1
    ),
    wide AS (
        SELECT
            max(CASE WHEN arm = 0 THEN n_users END) AS n0,
            max(CASE WHEN arm = 0 THEN n_converted END) AS c0,
            max(CASE WHEN arm = 1 THEN n_users END) AS n1,
            max(CASE WHEN arm = 1 THEN n_converted END) AS c1
        FROM arms
    )
    SELECT n0, c0, n1, c1,
           {sql_srnd("CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0", 6)}
               AS lift_abs,
           {sql_srnd(
               "(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) / "
               "sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) "
               " * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) "
               " * (1.0 / n0 + 1.0 / n1))", 4)} AS z_stat
    FROM wide
    """,
)
def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion lift (C80): deterministic arm assignment
    (user_id parity stands in for the experiment's hash bucketing),
    per-arm conversion (= heavy purchaser: ≥14 purchase events — the
    fixture's per-user purchase mean, so both outcomes occur at every
    sf and the pooled rate never degenerates to 0/1, which would zero
    the z denominator), absolute lift, and the pooled
    two-proportion z-statistic — the experimentation readout every
    event warehouse serves. Engine-stable because the statistic is a
    FIXED expression over four integers (the same IEEE op sequence on
    both sides), then srnd'd.

    Scale shape: assignment and conversion collapse to distinct-user
    frames (map-side combinable, user-keyed); the arm rollup is a
    2-key agg; the final statistic is computed on ONE row via
    conditional max pivot. Nothing here grows with event volume
    except the two distinct passes.
    """
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).distinct()
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("__np"))
        .filter(F.col("__np") >= 14)
        .select("user_id", F.lit(1).alias("converted"))
    )
    arms = (
        assign.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("long")
            .alias("n_converted"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (p1 - p0) / F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        srnd(p1 - p0, 6).alias("lift_abs"),
        srnd(z, 4).alias("z_stat"),
    )
