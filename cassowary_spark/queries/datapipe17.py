"""Round-6 wave 19 (SURVEY.md §2): serial-dependence analytics —
lagged autocorrelation of the daily revenue series, the diagnostic
that justifies (or refutes) C80's weekly seasonality assumption and
tells a forecaster how much signal yesterday carries about today.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

_LAGS = (1, 7, 30)


def _sql_lag_terms(k: int) -> str:
    # sums of squares/products stay HUGEINT (no BIGINT cast): at sf1
    # daily revenue (~1e8 $) the 2.4k-day Σx² passes 2e19 and
    # overflows int64 — caught by the r11 sf1 parity probe
    return f"""
        SELECT {k} AS lag_days,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(rev) AS BIGINT) AS sx,
               CAST(sum(lag_{k}) AS BIGINT) AS sy,
               sum(CAST(rev AS HUGEINT) * lag_{k}) AS sxy,
               sum(CAST(rev AS HUGEINT) * rev) AS sxx,
               sum(CAST(lag_{k} AS HUGEINT) * lag_{k}) AS syy
        FROM lagged WHERE lag_{k} IS NOT NULL
    """


@query(
    "q_autocorrelation",
    oracle=f"""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT day, rev,
               {", ".join(
                   f"lag(rev, {k}) OVER (ORDER BY day) AS lag_{k}"
                   for k in _LAGS
               )}
        FROM daily
    ),
    terms AS (
        {" UNION ALL ".join(_sql_lag_terms(k) for k in _LAGS)}
    )
    SELECT lag_days, n_pairs,
           {sql_srnd(
               "CAST(CAST(n_pairs AS HUGEINT) * sxy"
               "     - CAST(sx AS HUGEINT) * sy AS DOUBLE)"
               " / nullif(sqrt(CAST(CAST(n_pairs AS HUGEINT) * sxx"
               "         - CAST(sx AS HUGEINT) * sx AS DOUBLE)"
               "      * CAST(CAST(n_pairs AS HUGEINT) * syy"
               "         - CAST(sy AS HUGEINT) * sy AS DOUBLE)),"
               " 0.0)",
               6)} AS acf_r
    FROM terms
    """,
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged autocorrelation (C122): Pearson correlation of the daily
    revenue series with itself at lags 1, 7 and 30 days — the
    serial-dependence diagnostic behind every forecasting choice
    (lag-7 high → C80's weekly profile is justified; all lags ~0 →
    yesterday is noise and a trailing mean is as good as it gets).
    Row-indexed lags over the observed day sequence (standard ACF on
    an evenly-sampled series; the daily grid is near-complete here).

    Determinism: daily revenues are integer DOLLARS; the sums of
    squares/products accumulate in WIDE exact integers —
    DECIMAL(38,0) on Spark, HUGEINT on DuckDB (int64 sums overflowed
    at sf1's ~1e8-$ days, caught by the r11 sf1 parity probe; 38
    digits carry to ~1e15-$ days) — and the Pearson numerator/
    denominator terms are assembled exactly in that width; the ONLY
    float steps are the correctly-rounded exact-int→double
    conversions of the three assembled terms plus one sqrt and one
    division, identical in both engines, srnd-quantized.

    Scale shape: the raw scan collapses to a calendar-bounded daily
    agg; all three lag columns ride ONE ordered window pass (one
    sort, ~2.4k rows); the sufficient statistics are three
    conditional 1-row reduces unioned. At any corpus size the cost
    after the first map-side combine is calendar-sized.
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
        *[F.lag("rev", k).over(w).alias(f"lag_{k}") for k in _LAGS],
    )
    dec = "decimal(19,0)"
    # r14: ONE conditional aggregate computes every lag's sufficient
    # statistics (sum over rows where lag_k exists == the old
    # filter+agg branch), then a row-local unpivot — the old per-lag
    # union of 1-row aggregates re-ran the orders scan + daily agg +
    # window sort once PER LAG (3 full passes; guide §1.3 plan-branch
    # dedup). Identical exact-integer sums, identical assembly.
    aggs = []
    for k in _LAGS:
        y = F.col(f"lag_{k}")
        on = lambda e, y=y: F.when(y.isNotNull(), e)  # noqa: E731
        aggs += [
            F.count(y).cast("long").alias(f"np_{k}"),
            F.sum(on(F.col("rev"))).cast("long").alias(f"sx_{k}"),
            F.sum(y).cast("long").alias(f"sy_{k}"),
            F.sum(F.col("rev").cast(dec) * y.cast(dec)).alias(f"sxy_{k}"),
            F.sum(on(F.col("rev").cast(dec) * F.col("rev").cast(dec))).alias(
                f"sxx_{k}"
            ),
            F.sum(y.cast(dec) * y.cast(dec)).alias(f"syy_{k}"),
        ]
    one = lagged.agg(*aggs)
    terms = one.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("lag_days"),
                        F.col(f"np_{k}").alias("n_pairs"),
                        F.col(f"sx_{k}").alias("sx"),
                        F.col(f"sy_{k}").alias("sy"),
                        F.col(f"sxy_{k}").alias("sxy"),
                        F.col(f"sxx_{k}").alias("sxx"),
                        F.col(f"syy_{k}").alias("syy"),
                    )
                    for k in _LAGS
                ]
            )
        )
    )
    nd = F.col("n_pairs").cast(dec)
    num = (nd * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy").cast(dec)).cast(
        "double"
    )
    d1 = (nd * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx").cast(dec)).cast(
        "double"
    )
    d2 = (nd * F.col("syy") - F.col("sy").cast(dec) * F.col("sy").cast(dec)).cast(
        "double"
    )
    den = F.sqrt(d1 * d2)
    return terms.select(
        "lag_days",
        "n_pairs",
        srnd(num / F.nullif(den, F.lit(0.0)), 6).alias("acf_r"),
    )
