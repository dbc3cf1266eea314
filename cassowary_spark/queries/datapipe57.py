"""Round-11 wave 60 (SURVEY.md §2): temporal-structure analytics —
partial autocorrelation of the daily revenue series (C212),
inter-event burstiness (C213) and repeat-purchase latency quantiles
(C214).

C122's ACF says WHETHER lag k correlates; C212's PACF says whether
it correlates DIRECTLY (the AR-order picker). C213 measures whether
event streams are Poisson-like or bursty at the GAP level (C195
asked the same of counts). C214 turns C145's survival curve into the
two numbers a retention team quotes (median / p90 days to reorder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------- C212 partial autocorrelation (lags 1-3)

_SQL_DAILY_DOLLARS = """
    daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    )
"""


def _sql_acf(k: int) -> str:
    # wide-exact (HUGEINT) sufficient statistics, assembled exactly,
    # ONE double conversion per term (the C122 r11 discipline —
    # int64 Σx² overflows at sf1's ~1e8-$ days)
    return f"""
        SELECT {k} AS lag_days,
               floor((CAST(CAST(count(*) AS HUGEINT)
                           * sum(CAST(rev AS HUGEINT) * lag_{k})
                           - CAST(sum(rev) AS HUGEINT) * sum(lag_{k})
                           AS DOUBLE)
                      / nullif(sqrt(CAST(CAST(count(*) AS HUGEINT)
                                * sum(CAST(rev AS HUGEINT) * rev)
                                - CAST(sum(rev) AS HUGEINT) * sum(rev)
                                AS DOUBLE)
                               * CAST(CAST(count(*) AS HUGEINT)
                                  * sum(CAST(lag_{k} AS HUGEINT)
                                        * lag_{k})
                                  - CAST(sum(lag_{k}) AS HUGEINT)
                                    * sum(lag_{k}) AS DOUBLE)),
                               0.0)) * 100000000.0 + 0.5) / 100000000.0
                   AS r
        FROM lagged WHERE lag_{k} IS NOT NULL
    """


@query(
    "q_pacf",
    oracle=f"""
    WITH {_SQL_DAILY_DOLLARS},
    lagged AS (
        SELECT day, rev,
               lag(rev, 1) OVER (ORDER BY day) AS lag_1,
               lag(rev, 2) OVER (ORDER BY day) AS lag_2,
               lag(rev, 3) OVER (ORDER BY day) AS lag_3
        FROM daily
    ),
    a1 AS ({_sql_acf(1)}), a2 AS ({_sql_acf(2)}), a3 AS ({_sql_acf(3)}),
    rr AS (
        SELECT (SELECT r FROM a1) AS r1, (SELECT r FROM a2) AS r2,
               (SELECT r FROM a3) AS r3
    ),
    phi AS (
        SELECT r1, r2, r3,
               r1 AS p1,
               (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0) AS p2
        FROM rr
    ),
    phi2 AS (
        SELECT r1, r2, r3, p1, p2,
               r1 * (1.0 - p2) AS p21
        FROM phi
    ),
    phi3 AS (
        SELECT r1, r2, r3, p1, p2,
               (r3 - p21 * r2 - p2 * r1)
                   / nullif(1.0 - p21 * r1 - p2 * r2, 0.0) AS p3
        FROM phi2
    )
    SELECT lag_days, acf_r, pacf FROM (
        SELECT 1 AS lag_days, {sql_srnd("r1", 6)} AS acf_r,
               {sql_srnd("p1", 6)} AS pacf FROM phi3
        UNION ALL
        SELECT 2, {sql_srnd("r2", 6)}, {sql_srnd("p2", 6)} FROM phi3
        UNION ALL
        SELECT 3, {sql_srnd("r3", 6)}, {sql_srnd("p3", 6)} FROM phi3
    )
    """,
)
def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (C212): PACF of the daily revenue
    series at lags 1-3 via the Durbin-Levinson closed forms
    (φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²); φ₃₃ from the order-2
    coefficients) — the AR-order picker: C122's ACF at lag 2 can be
    high merely because lag 1 is; PACF answers whether day t−2
    carries DIRECT signal, which decides between an AR(1) trailing
    baseline (C58) and a longer model.

    Determinism: the lag correlations reuse C122's wide-exact
    sufficient statistics (DECIMAL(38,0) / HUGEINT — int64 Σx²
    overflowed at sf1, the r11 probe) and are srnd8-QUANTIZED before
    entering the Durbin-Levinson chain, so every downstream φ is a
    fixed IEEE expression over identical quantized inputs in both
    engines; outputs srnd6, degenerate denominators NULL-guarded.

    Scale shape: the corpus collapses to the calendar-bounded daily
    agg; all three lag columns ride ONE ordered window over that
    frame (C122's shape); the r's are three 1-row reduces combined
    by 1-row broadcasts; the φ chain and the 3-row output are
    driver-trivial expressions.
    """
    o = load_table(spark, sf_dir, "orders")
    dollars = F.floor(F.col("o_totalprice") + 0.5).cast("long")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(dollars).alias("rev"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "rev",
        *[F.lag("rev", k).over(w).alias(f"lag_{k}") for k in (1, 2, 3)],
    )

    # r14: ONE conditional aggregate computes all three lags'
    # wide-exact sufficient statistics (the C122 r11 discipline —
    # int64 Σx² overflows at sf1 daily revenue); the old per-lag
    # filter+agg branches re-ran the orders scan + daily agg + window
    # sort once PER LAG and met again through two crossJoins (guide
    # §1.3 plan-branch dedup). Identical exact sums, identical
    # assembly, srnd8 at the same point.
    dec = "decimal(19,0)"
    aggs = []
    for k in (1, 2, 3):
        y = F.col(f"lag_{k}")
        on = lambda e, y=y: F.when(y.isNotNull(), e)  # noqa: E731
        aggs += [
            F.count(y).cast("long").alias(f"n_{k}"),
            F.sum(on(F.col("rev"))).cast("long").alias(f"sx_{k}"),
            F.sum(y).cast("long").alias(f"sy_{k}"),
            F.sum(F.col("rev").cast(dec) * y.cast(dec)).alias(f"sxy_{k}"),
            F.sum(on(F.col("rev").cast(dec) * F.col("rev").cast(dec))).alias(
                f"sxx_{k}"
            ),
            F.sum(y.cast(dec) * y.cast(dec)).alias(f"syy_{k}"),
        ]

    def r_expr(k: int):
        nd = F.col(f"n_{k}").cast(dec)
        num = (
            nd * F.col(f"sxy_{k}")
            - F.col(f"sx_{k}").cast(dec) * F.col(f"sy_{k}").cast(dec)
        ).cast("double")
        d1 = (
            nd * F.col(f"sxx_{k}")
            - F.col(f"sx_{k}").cast(dec) * F.col(f"sx_{k}").cast(dec)
        ).cast("double")
        d2 = (
            nd * F.col(f"syy_{k}")
            - F.col(f"sy_{k}").cast(dec) * F.col(f"sy_{k}").cast(dec)
        ).cast("double")
        den = F.sqrt(d1 * d2)
        return srnd(num / F.nullif(den, F.lit(0.0)), 8).alias(f"r{k}")

    rr = lagged.agg(*aggs).select(r_expr(1), r_expr(2), r_expr(3))
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p2 = (r2 - r1 * r1) / F.nullif(1.0 - r1 * r1, F.lit(0.0))
    phi = rr.select(
        r1.alias("r1"), r2.alias("r2"), r3.alias("r3"), p2.alias("p2")
    )
    p21 = r1 * (1.0 - F.col("p2"))
    p3 = (r3 - p21 * r2 - F.col("p2") * r1) / F.nullif(
        1.0 - p21 * r1 - F.col("p2") * r2, F.lit(0.0)
    )
    full = phi.withColumn("p3", p3)
    rows = F.array(
        F.struct(
            F.lit(1).cast("int").alias("lag_days"),
            srnd(r1, 6).alias("acf_r"),
            srnd(r1, 6).alias("pacf"),
        ),
        F.struct(
            F.lit(2).cast("int").alias("lag_days"),
            srnd(r2, 6).alias("acf_r"),
            srnd(F.col("p2"), 6).alias("pacf"),
        ),
        F.struct(
            F.lit(3).cast("int").alias("lag_days"),
            srnd(r3, 6).alias("acf_r"),
            srnd(F.col("p3"), 6).alias("pacf"),
        ),
    )
    return full.select(F.inline(rows))


# ------------------------------------- C213 inter-event burstiness


@query(
    "q_burstiness",
    oracle=f"""
    WITH gaps AS (
        SELECT event_type,
               date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id),
                   ts) AS g
        FROM events
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(sum(g) AS BIGINT) AS sg,
               CAST(sum(g * g) AS BIGINT) AS sgg
        FROM gaps WHERE g IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n_gaps,
           {sql_srnd(
               "CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)", 4)}
               AS mean_gap_s,
           {sql_srnd(
               "(sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE)"
               "      - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))"
               "        * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))"
               " - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))"
               " / nullif(sqrt(CAST(sgg AS DOUBLE)"
               "          / CAST(n_gaps AS DOUBLE)"
               "      - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))"
               "        * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))"
               " + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE), 0.0)",
               6)} AS burstiness
    FROM s
    """,
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event burstiness (C213): per event type, the
    Goh-Barabási coefficient B = (σ−μ)/(σ+μ) over the
    within-(user, type) inter-event gaps — B → −1 for clockwork
    streams, 0 for Poisson, → +1 for extreme bursts. The GAP-level
    twin of C195's count dispersion: counts can look Poisson while
    gaps are bursty inside the bucket (and bursty gaps are what
    break C23-style sessionization thresholds).

    Determinism: gaps are exact integer second diffs over the
    strict (ts, event_id) order; Σg and Σg² are exact BIGINT sums in
    any order (headroom documented: gaps ≤ the 30-day fixture span,
    ≤ 2.6e6 s, squares ≤ 6.8e12 — 1.3M gaps per type before BIGINT
    pressure at 9.2e18; wider spans quantize to minutes); μ, σ, B
    are fixed srnd expressions; σ+μ = 0 (possible only when every
    gap is zero) is NULL-guarded.

    Scale shape: the lag window partitions by (user, type) — high
    cardinality, embarrassingly parallel, never single-partition;
    the rollup is a |types|-row partial agg. One scan, one window
    exchange, one agg exchange.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    g = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ).cast("long")
    gaps = ev.select("event_type", g.alias("g")).filter(
        F.col("g").isNotNull()
    )
    s = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("sg"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("sgg"),
    )
    mu = F.col("sg").cast("double") / F.col("n_gaps").cast("double")
    sigma = F.sqrt(
        F.col("sgg").cast("double") / F.col("n_gaps").cast("double")
        - mu * mu
    )
    return s.select(
        "event_type",
        "n_gaps",
        srnd(mu, 4).alias("mean_gap_s"),
        srnd((sigma - mu) / F.nullif(sigma + mu, F.lit(0.0)), 6).alias(
            "burstiness"
        ),
    )


# ---------------------------- C214 repeat-purchase latency quantiles


@query(
    "q_repurchase_latency",
    oracle=f"""
    WITH jo AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(o.o_orderdate AS DATE) AS d, o.o_orderkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    gaps AS (
        SELECT segment,
               date_diff('day',
                   lag(d) OVER (PARTITION BY o_custkey
                                ORDER BY d, o_orderkey),
                   d) AS g
        FROM jo
    ),
    cells AS (
        SELECT segment, g, CAST(count(*) AS BIGINT) AS cnt
        FROM gaps WHERE g IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
        SELECT segment, g, cnt,
               CAST(sum(cnt) OVER (PARTITION BY segment ORDER BY g)
                    AS BIGINT) AS c,
               CAST(sum(cnt) OVER (PARTITION BY segment) AS BIGINT) AS n,
               CAST(sum(g * cnt) OVER (PARTITION BY segment) AS BIGINT)
                   AS sg
        FROM cells
    )
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(min(CASE WHEN 2 * c >= n + 1 THEN g END) AS BIGINT)
               AS median_days,
           CAST(min(CASE WHEN 10 * c >= 9 * n THEN g END) AS BIGINT)
               AS p90_days,
           {sql_srnd(
               "CAST(max(sg) AS DOUBLE) / CAST(max(n) AS DOUBLE)",
               4)} AS mean_days
    FROM cum GROUP BY segment
    """,
)
def q_repurchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase latency (C214): per market segment, the
    median, p90 and mean days between a customer's consecutive
    orders — the two numbers a retention team actually quotes from
    C145's survival curve ("half reorder within X days, the slowest
    decile takes Y"), and the data-driven horizon for C114's churn
    label window.

    Quantiles are counts-based nearest-rank over the gap-day cells
    (median = smallest gap with 2·cum ≥ n+1; p90 = smallest with
    10·cum ≥ 9n) — tie-invariant, exact BIGINT comparisons, no
    positional cut anywhere (the r11 banding discipline).

    Scale shape: the per-customer lag window partitions by custkey
    (parallel); one groupBy collapses gaps to the (segment, days)
    cells frame — day-domain-bounded; running sums partition by
    segment over THAT frame; the rollup is |segments| rows. The
    customer join shuffles orders by custkey once (the same
    co-partitioning every per-customer metric uses).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    jo = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_custkey"),
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = jo.select(
        "segment", F.datediff(F.col("d"), F.lag("d").over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    cells = gaps.groupBy("segment", "g").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wc = (
        Window.partitionBy("segment")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("segment")
    cum = cells.select(
        "segment",
        "g",
        "cnt",
        F.sum("cnt").over(wc).cast("long").alias("c"),
        F.sum("cnt").over(wn).cast("long").alias("n"),
        F.sum(F.col("g") * F.col("cnt")).over(wn).cast("long").alias("sg"),
    )
    return cum.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.min(F.when(2 * F.col("c") >= F.col("n") + 1, F.col("g")))
        .cast("long")
        .alias("median_days"),
        F.min(F.when(10 * F.col("c") >= 9 * F.col("n"), F.col("g")))
        .cast("long")
        .alias("p90_days"),
        srnd(
            F.max("sg").cast("double") / F.max("n").cast("double"), 4
        ).alias("mean_days"),
    )
