"""Round-9 wave 54 (SURVEY.md §2): Gumbel return levels over daily
maxima (C194) and the count dispersion index (C195).

C194 is the extreme-value capacity question ("what daily peak do we
see once a quarter/year") that C178's Hill index motivates but
doesn't answer; C195 is the count-model diagnostic that says whether
per-period event counts are Poisson-like or overdispersed — the
assumption check behind every rate alert threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------ C194 Gumbel return levels

# method-of-moments constants: beta = s·√6/π, mu = m − gamma·beta
_GUM_SQRT6_PI = 0.7796968  # √6/π
_GUM_GAMMA = 0.5772157  # Euler-Mascheroni
# -ln(-ln(1 - 1/T)) for T = 30, 90, 365 (offline, C156 discipline)
_GUM_Y = {30: 3.3842522, 90: 4.4939504, 365: 5.8981239}


def _gum_rl_sql(T: int) -> str:
    return (
        f"mu + beta * {_GUM_Y[T]}"
    )


@query(
    "q_gumbel_return_level",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(day(ts) AS INT) AS d,
               CAST(max(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS mx
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(mx) AS BIGINT) AS sm,
               CAST(sum(mx * mx) AS BIGINT) AS qm
        FROM daily
    ),
    fit AS (
        SELECT n,
               {sql_srnd(
                   "CAST(sm AS DOUBLE) / (100.0 * CAST(n AS DOUBLE))",
                   8)} AS m,
               {sql_srnd(
                   "sqrt((CAST(qm AS DOUBLE) / CAST(n AS DOUBLE)"
                   " - (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))"
                   "   * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)))"
                   " / 10000.0"
                   " * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0))"
                   " * {sp}", 8).replace("{sp}", "{_sp}")} AS beta
        FROM s
    ),
    p AS (
        SELECT n, m, beta,
               {sql_srnd("m - {_g} * beta", 8)} AS mu
        FROM fit
    )
    SELECT n AS n_days,
           {sql_srnd("mu", 6)} AS gumbel_mu,
           {sql_srnd("beta", 6)} AS gumbel_beta,
           {sql_srnd(_gum_rl_sql(30), 6)} AS rl_30d,
           {sql_srnd(_gum_rl_sql(90), 6)} AS rl_90d,
           {sql_srnd(_gum_rl_sql(365), 6)} AS rl_365d
    FROM p
    """.replace("{_sp}", str(_GUM_SQRT6_PI)).replace(
        "{_g}", str(_GUM_GAMMA)
    ),
)
def q_gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel return levels (C194): fit the daily-maximum event value
    by method of moments (β̂ = s·√6/π, μ̂ = m̄ − γ·β̂ — the classic
    EVT block-maxima fit) and report the 30/90/365-day return levels
    μ + β·(−ln(−ln(1−1/T))) — "what single-event peak do we expect
    once a month / quarter / year", the capacity-planning number
    C178's tail index motivates but doesn't produce. The three
    −ln(−ln(·)) constants are compile-time literals (C156
    discipline), as are √6/π and Euler's γ.

    Determinism: daily maxima are exact BIGINT cents (max is
    order-free); (n, Σ, Σ²) over ≤31 daily rows are exact; m̄, the
    sample-corrected s, μ̂, β̂ are fixed IEEE expressions srnd8'd and
    each return level one srnd6 expression over the quantized fit.

    Scale shape: one day-keyed partial-agg max (map-side combined)
    to ≤31 rows, one 1-row moment reduce, row-local fit arithmetic.
    At 100 TB the block-maxima frame is still calendar-sized — EVT's
    whole point is that only maxima matter.
    """
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    daily = (
        ev.select(
            F.dayofmonth("ts").alias("d"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.max("cents").cast("long").alias("mx"))
    )
    s = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("mx").cast("long").alias("sm"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("qm"),
    )
    nd = F.col("n").cast("double")
    m = srnd(F.col("sm").cast("double") / (100.0 * nd), 8)
    beta = srnd(
        F.sqrt(
            (
                F.col("qm").cast("double") / nd
                - (F.col("sm").cast("double") / nd)
                * (F.col("sm").cast("double") / nd)
            )
            / 10000.0
            * nd
            / (nd - 1.0)
        )
        * _GUM_SQRT6_PI,
        8,
    )
    fit = s.select("n", m.alias("m"), beta.alias("beta"))
    p = fit.withColumn("mu", srnd(F.col("m") - _GUM_GAMMA * F.col("beta"), 8))
    return p.select(
        F.col("n").alias("n_days"),
        srnd(F.col("mu"), 6).alias("gumbel_mu"),
        srnd(F.col("beta"), 6).alias("gumbel_beta"),
        srnd(F.col("mu") + F.col("beta") * _GUM_Y[30], 6).alias("rl_30d"),
        srnd(F.col("mu") + F.col("beta") * _GUM_Y[90], 6).alias("rl_90d"),
        srnd(F.col("mu") + F.col("beta") * _GUM_Y[365], 6).alias("rl_365d"),
    )


# ----------------------------------------- C195 dispersion index


@query(
    "q_dispersion_index",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(day(ts) AS INT) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS BIGINT) AS sc,
               CAST(sum(c * c) AS BIGINT) AS qc
        FROM daily GROUP BY 1
    )
    SELECT event_type, n_days,
           {sql_srnd(
               "CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)", 6)} AS mean_c,
           {sql_srnd(
               "(CAST(qc AS DOUBLE) / CAST(n_days AS DOUBLE)"
               " - (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))"
               "   * (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)))"
               " * CAST(n_days AS DOUBLE)"
               " / (CAST(n_days AS DOUBLE) - 1.0)"
               " / nullif(CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE), 0.0)",
               6)} AS dispersion,
           CAST(CASE WHEN
               {sql_srnd(
                   "(CAST(qc AS DOUBLE) / CAST(n_days AS DOUBLE)"
                   " - (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))"
                   "   * (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)))"
                   " * CAST(n_days AS DOUBLE)"
                   " / (CAST(n_days AS DOUBLE) - 1.0)"
                   " / nullif(CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE),"
                   " 0.0)", 6)} > 1.5
               THEN 1 ELSE 0 END AS INT) AS overdispersed
    FROM s
    """,
)
def q_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count dispersion index (C195): per event type, the
    variance-to-mean ratio of DAILY counts with an overdispersion
    flag at >1.5 — the Poisson assumption check behind every rate
    alert: a Poisson stream has dispersion 1, so thresholds set from
    √mean are wrong exactly when this index says counts are bursty
    (campaigns, bots, retries — C81's cadence sees per-user rhythm,
    this sees the aggregate's burstiness). Under 1 means
    anti-bunched (rate-limited/quota'd) traffic — also worth knowing.

    Determinism: daily counts are exact BIGINTs; (n, Σ, Σ²) per type
    exact; the sample-variance/mean ratio is one fixed IEEE
    expression srnd6'd, and the flag compares the QUANTIZED index
    to the literal threshold.

    Scale shape: one (type, day)-keyed partial-agg count (map-side
    combined) to a calendar×types frame, then a type rollup —
    metadata-sized at any corpus scale.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    daily = ev.select(
        "event_type", F.dayofmonth("ts").alias("d")
    ).groupBy("event_type", "d").agg(F.count("*").cast("long").alias("c"))
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("qc"),
    )
    nd = F.col("n_days").cast("double")
    mean_c = F.col("sc").cast("double") / nd
    disp = srnd(
        (F.col("qc").cast("double") / nd - mean_c * mean_c)
        * nd
        / (nd - 1.0)
        / F.nullif(mean_c, F.lit(0.0)),
        6,
    )
    return s.select(
        "event_type",
        "n_days",
        srnd(mean_c, 6).alias("mean_c"),
        disp.alias("dispersion"),
        F.when(disp > 1.5, 1).otherwise(0).cast("int").alias("overdispersed"),
    )
