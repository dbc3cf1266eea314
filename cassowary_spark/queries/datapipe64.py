"""Round-12 wave 67 (SURVEY.md §2): time-series diagnostics and
design-based estimators — Friedman's k-treatment block test (C235),
Durbin–Watson serial correlation (C236), the Ljung–Box portmanteau
(C237), the Wald IV estimator (C238), a sharp regression-
discontinuity fit (C239) and the Horvitz–Thompson stratified total
(C240).

C235 completes the rank-test family (C189/C190 compare independent
groups; Friedman compares k REPEATED treatments across blocks);
C236/C237 are the residual-autocorrelation diagnostics that decide
whether C139/C144's trailing-window forecasts are even admissible;
C238/C239 extend the causal family (C160 diff-in-diff, C175 CEM,
C191 CUPED) with the two classic quasi-experimental designs; C240 is
the unequal-probability sampling estimator behind every stratified
corpus subsample (C8's strat sampling tells you WHAT was kept — HT
tells you what the kept rows ESTIMATE).

Same determinism discipline as wave 66: exact integer sufficient
statistics, fixed IEEE assembly, C69 ordered folds, srnd on
magnitude-STABLE quantities only (the r12 floor-saturation rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------------ C235 Friedman block test


@query(
    "q_friedman",
    oracle=f"""
    WITH ev AS (
        SELECT strftime(ts, '%Y-%m-%d') AS blk, event_type AS trt,
               CAST(count(*) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT b.blk, t.trt, coalesce(ev.v, 0) AS v
        FROM (SELECT DISTINCT blk FROM ev) b
        CROSS JOIN (SELECT DISTINCT trt FROM ev) t
        LEFT JOIN ev ON ev.blk = b.blk AND ev.trt = t.trt
    ),
    rk AS (
        SELECT blk, trt,
               CAST(2 * rank() OVER (PARTITION BY blk ORDER BY v)
                    + count(*) OVER (PARTITION BY blk, v) - 1
                    AS BIGINT) AS u2
        FROM grid
    ),
    rs AS (
        SELECT trt, CAST(sum(u2) AS BIGINT) AS r2 FROM rk GROUP BY trt
    ),
    dims AS (
        SELECT CAST(count(DISTINCT blk) AS BIGINT) AS n,
               CAST(count(DISTINCT trt) AS BIGINT) AS k
        FROM grid
    )
    SELECT (SELECT n FROM dims) AS n_blocks,
           (SELECT k FROM dims) AS k_treatments,
           {sql_srnd(
               "12.0 / (CAST((SELECT n FROM dims) AS DOUBLE)"
               "        * (SELECT k FROM dims)"
               "        * ((SELECT k FROM dims) + 1.0))"
               " * list_sum(list("
               "     CAST(r2 AS DOUBLE) * r2 / 4.0 ORDER BY trt))"
               " - 3.0 * (SELECT n FROM dims)"
               "   * ((SELECT k FROM dims) + 1.0)", 6
           )} AS q_stat
    FROM rs LIMIT 1
    """,
)
def q_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (C235): do the five event types keep the same
    volume ORDERING across calendar days? Blocks = days,
    treatments = event types, response = daily count; within each
    block the k responses are midranked and Q = 12/(nk(k+1))·ΣR_j² −
    3n(k+1). The repeated-measures sibling of C190's Kruskal–Wallis —
    blocking by day removes the global traffic trend that would
    drown a between-groups test.

    Determinism: the block grid is completed (missing cells = 0) so
    every block ranks exactly k values; midranks via the doubled-rank
    identity u2 = 2·rank + ties − 1 (exact integers — rank() and the
    tie count partition by the same keys in both engines); rank sums
    are exact BIGINTs; the ≤k float terms of ΣR² fold in treatment
    order (C69), one srnd6.

    Scale shape: one map-side-combining groupBy to the (days ×
    types) grid; ranks ride windows PARTITIONED by block over that
    calendar-bounded frame (k rows per task — never a corpus window);
    the statistic is arithmetic on a k-row frame.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("blk"),
            F.col("event_type").alias("trt"),
        )
        .agg(F.count("*").cast("long").alias("v"))
    )
    # r14: grid completion, per-block midranks, rank sums and the ΣR²
    # fold all run row-locally over the packed (blk, trt, v) array in
    # ONE 1-row aggregate (was: 2-distinct crossJoin grid + left join
    # + 2 windows + 2 extra jobs). Midranks use the same doubled-rank
    # identity on exact integers: u2 = 2·(1 + #strictly-less) + #ties
    # − 1 over each completed k-vector (missing cells = 0); the
    # singleton-array transform binds each block's slice so the scan
    # of the cell array is once per block, not once per (block,
    # treatment).
    packed = ev.agg(
        F.expr("array_sort(collect_list(struct(blk, trt, v)))").alias("cs")
    ).select(
        "cs",
        F.expr("array_sort(array_distinct(transform(cs, c -> c.blk)))")
        .alias("blks"),
        F.expr("array_sort(array_distinct(transform(cs, c -> c.trt)))")
        .alias("trts"),
    )
    u2mat = (
        "transform(blks, b ->"
        " transform(array(filter(cs, c -> c.blk = b)), sl ->"
        "  transform(array(transform(trts, t ->"
        "    aggregate(filter(sl, c2 -> c2.trt = t), 0L,"
        "     (a2, c3) -> a2 + c3.v))), vs ->"
        "   transform(vs, vi ->"
        "    CAST(2 * (1 + size(filter(vs, vj -> vj < vi)))"
        "     + size(filter(vs, vj -> vj = vi)) - 1 AS BIGINT))"
        "  )[0]"
        " )[0]"
        ")"
    )
    r2s = (
        "transform(sequence(1, CAST(k AS INT)), j ->"
        " aggregate(u2m, 0L, (ar, row) -> ar + element_at(row, j)))"
    )
    agg = packed.select(
        F.expr("CAST(size(blks) AS BIGINT)").alias("n"),
        F.expr("CAST(size(trts) AS BIGINT)").alias("k"),
        F.expr(u2mat).alias("u2m"),
    ).select(
        "n",
        "k",
        F.expr(
            f"aggregate(array({r2s}), CAST(0.0 AS DOUBLE), (acc, rr) ->"
            " acc + aggregate(rr, CAST(0.0 AS DOUBLE), (ac2, r2) ->"
            " ac2 + CAST(r2 AS DOUBLE) * r2 / 4.0))"
        ).alias("sr2"),
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    return agg.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        srnd(
            12.0 / (n * k * (k + 1.0)) * F.col("sr2")
            - 3.0 * n * (k + 1.0),
            6,
        ).alias("q_stat"),
    )


# -------------------------------------- C236 Durbin–Watson statistic

# strftime/date_format agree on '%Y-%m-%d' / 'yyyy-MM-dd' (the C122
# convention) — the day key orders identically in both engines.


@query(
    "q_durbin_watson",
    oracle=f"""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT day, rev, lag(rev) OVER (ORDER BY day) AS prev,
               CAST(count(*) OVER () AS BIGINT) AS n,
               CAST(sum(rev) OVER () AS HUGEINT) AS s
        FROM daily
    ),
    terms AS (
        SELECT max(n) AS n,
            CAST(sum(CASE WHEN prev IS NULL THEN 0
                     ELSE CAST(rev - prev AS HUGEINT) * (rev - prev)
                     END) AS HUGEINT) AS sdiff,
            CAST(sum((CAST(rev AS HUGEINT) * max_n - max_s)
                     * (CAST(rev AS HUGEINT) * max_n - max_s))
                 AS HUGEINT) AS sdev
        FROM (SELECT *, max(n) OVER () AS max_n, max(s) OVER () AS max_s
              FROM lagged)
        GROUP BY ALL
    )
    SELECT n AS n_days,
           {sql_srnd(
               "CAST(n AS DOUBLE) * n * CAST(sdiff AS DOUBLE)"
               " / nullif(CAST(sdev AS DOUBLE), 0.0)", 6
           )} AS dw_stat
    FROM terms
    """,
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson statistic (C236) of the mean-centered daily
    revenue series: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² ∈ [0,4] — ≈2 means the
    residuals of the flat-mean model are serially independent, <2
    positive autocorrelation (C122's lag-1 r in test form). The
    canonical "are forecast residuals white" gate for C129/C144.

    Determinism: mean-centering cancels in the numerator (Δe = Δrev),
    and the denominator clears the mean's denominator exactly:
    DW = N²·Σ(Δrev)² / Σ(N·rev − S)² — every term an exact wide
    integer (HUGEINT/DECIMAL(38,0); (N·rev)² crosses int64 by sf0.1),
    one guarded float division, srnd6.

    Scale shape: the corpus collapses to the calendar-bounded daily
    frame; the lag and the exact totals ride windows over THAT frame
    only. DW of 100 TB of orders is DW of its ~2.4k daily sums.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") + 0.5).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    lagged = daily.select(
        "rev",
        F.lag("rev").over(w).alias("prev"),
        F.count("*").over(wall).cast("long").alias("n"),
        F.sum("rev").over(wall).cast(dec).alias("s"),
    )
    dev = F.col("rev").cast(dec) * F.col("n") - F.col("s")
    terms = lagged.agg(
        F.max("n").alias("n"),
        F.sum(
            F.when(F.col("prev").isNull(), F.lit(0).cast(dec)).otherwise(
                (F.col("rev") - F.col("prev")).cast(dec)
                * (F.col("rev") - F.col("prev"))
            )
        ).alias("sdiff"),
        F.sum(dev * dev).alias("sdev"),
    )
    n = F.col("n").cast("double")
    return terms.select(
        F.col("n").alias("n_days"),
        srnd(
            n * n * F.col("sdiff").cast("double")
            / F.nullif(F.col("sdev").cast("double"), F.lit(0.0)),
            6,
        ).alias("dw_stat"),
    )


# ----------------------------------------- C237 Ljung–Box portmanteau

_LB_LAGS = list(range(1, 8))


def _lb_sql_term(k: int) -> str:
    return f"""
        SELECT {k} AS lag_k,
            CAST(count(*) AS BIGINT) AS np,
            CAST(sum(CAST(rev AS HUGEINT)) AS HUGEINT) AS sx,
            CAST(sum(CAST(lag_{k} AS HUGEINT)) AS HUGEINT) AS sy,
            CAST(sum(CAST(rev AS HUGEINT) * rev) AS HUGEINT) AS sxx,
            CAST(sum(CAST(lag_{k} AS HUGEINT) * lag_{k}) AS HUGEINT) AS syy,
            CAST(sum(CAST(rev AS HUGEINT) * lag_{k}) AS HUGEINT) AS sxy
        FROM lagged WHERE lag_{k} IS NOT NULL
    """


@query(
    "q_ljung_box",
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
                   for k in _LB_LAGS
               )}
        FROM daily
    ),
    terms AS ({" UNION ALL ".join(_lb_sql_term(k) for k in _LB_LAGS)}),
    rs AS (
        SELECT lag_k,
            {sql_srnd(
                "CAST(CAST(np AS HUGEINT) * sxy - sx * sy AS DOUBLE)"
                " / nullif(sqrt(CAST(CAST(np AS HUGEINT) * sxx"
                "                    - sx * sx AS DOUBLE)"
                "          * CAST(CAST(np AS HUGEINT) * syy"
                "                    - sy * sy AS DOUBLE)), 0.0)", 6
            )} AS r
        FROM terms
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
    SELECT (SELECT n FROM nn) AS n_days,
           CAST({len(_LB_LAGS)} AS BIGINT) AS dof,
           {sql_srnd(
               "(SELECT n FROM nn) * ((SELECT n FROM nn) + 2.0)"
               " * list_sum(list("
               "     r * r / ((SELECT n FROM nn) - lag_k)"
               "     ORDER BY lag_k))", 6
           )} AS q_stat
    FROM rs LIMIT 1
    """,
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau (C237): Q = n(n+2)·Σₖ rₖ²/(n−k) over the
    first 7 lag correlations of the daily revenue series — "is there
    ANY autocorrelation in the first week of lags", the joint test
    behind C122's per-lag view and the standard residual-whiteness
    gate a forecast (C129/C144) must pass before its intervals mean
    anything.

    Determinism: each rₖ is the C122 recipe verbatim (exact wide-int
    sufficient statistics per lag, fixed assembly, srnd6) and Q is
    assembled FROM the quantized rₖ — a fold over 7 terms in lag
    order (C69), srnd6. All seven lag columns ride ONE ordered window
    pass over the daily frame.

    Scale shape: calendar-bounded after the first collapse, like
    C122/C236 — the seven conditional 1-row reduces are unioned, and
    nothing downstream of the daily agg scales with the corpus.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") + 0.5).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "rev",
        *[F.lag("rev", k).over(w).alias(f"lag_{k}") for k in _LB_LAGS],
    )
    # r14: ONE conditional aggregate computes every lag's sufficient
    # statistics plus n_days (count of daily rows rides the same
    # pass), then a row-local unpivot — the old per-lag union of
    # 1-row aggregates re-ran orders scan + daily agg + window sort
    # once PER LAG (7 full passes; guide §1.3), and daily needed a
    # persist + a separate count job. Identical exact sums, fold
    # unchanged.
    aggs = [F.count("*").cast("long").alias("n_days")]
    for k in _LB_LAGS:
        y = F.col(f"lag_{k}")
        on = lambda e, y=y: F.when(y.isNotNull(), e)  # noqa: E731
        aggs += [
            F.count(y).cast("long").alias(f"np_{k}"),
            F.sum(on(F.col("rev").cast(dec))).alias(f"sx_{k}"),
            F.sum(y.cast(dec)).alias(f"sy_{k}"),
            F.sum(on(F.col("rev").cast(dec) * F.col("rev"))).alias(
                f"sxx_{k}"
            ),
            F.sum(y.cast(dec) * y).alias(f"syy_{k}"),
            F.sum(F.col("rev").cast(dec) * y).alias(f"sxy_{k}"),
        ]
    one = lagged.agg(*aggs)
    terms = one.select(
        F.col("n_days"),
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("lag_k"),
                        F.col(f"np_{k}").alias("np"),
                        F.col(f"sx_{k}").alias("sx"),
                        F.col(f"sy_{k}").alias("sy"),
                        F.col(f"sxx_{k}").alias("sxx"),
                        F.col(f"syy_{k}").alias("syy"),
                        F.col(f"sxy_{k}").alias("sxy"),
                    )
                    for k in _LB_LAGS
                ]
            )
        ),
    )
    npd = F.col("np").cast(dec)
    r = srnd(
        (npd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.nullif(
            F.sqrt(
                (npd * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (npd * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            F.lit(0.0),
        ),
        6,
    )
    rs = terms.select("lag_k", F.col("n_days").alias("n"), r.alias("r"))
    fold = F.expr(
        "aggregate(array_sort(collect_list(struct(lag_k, t))),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.t)"
    )
    agg = (
        rs.select(
            "lag_k",
            "n",
            (
                F.col("r")
                * F.col("r")
                / (F.col("n").cast("double") - F.col("lag_k"))
            ).alias("t"),
        )
        .groupBy("n")
        .agg(fold.alias("s"))
    )
    n = F.col("n").cast("double")
    return agg.select(
        F.col("n").alias("n_days"),
        F.lit(len(_LB_LAGS)).cast("long").alias("dof"),
        srnd(n * (n + 2.0) * F.col("s"), 6).alias("q_stat"),
    )


# ------------------------------------------- C238 Wald IV estimator


@query(
    "q_wald_iv",
    oracle=f"""
    WITH u AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS z,
            CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                 AS BIGINT) AS x,
            CAST(sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT z, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy
        FROM u GROUP BY z
    ),
    w AS (
        SELECT
            max(CASE WHEN z = 1 THEN n END) AS n1,
            max(CASE WHEN z = 0 THEN n END) AS n0,
            max(CASE WHEN z = 1 THEN sx END) AS sx1,
            max(CASE WHEN z = 0 THEN sx END) AS sx0,
            max(CASE WHEN z = 1 THEN sy END) AS sy1,
            max(CASE WHEN z = 0 THEN sy END) AS sy0
        FROM g
    )
    SELECT n0 AS n_users_0, n1 AS n_users_1,
        {sql_srnd(
            "CAST(sy1 AS DOUBLE) / n1 / 100.0"
            " - CAST(sy0 AS DOUBLE) / n0 / 100.0", 6)} AS itt_y,
        {sql_srnd(
            "CAST(sx1 AS DOUBLE) / n1"
            " - CAST(sx0 AS DOUBLE) / n0", 6)} AS itt_x,
        {sql_srnd(
            "(CAST(sy1 AS DOUBLE) / n1 / 100.0"
            " - CAST(sy0 AS DOUBLE) / n0 / 100.0)"
            " / nullif(CAST(sx1 AS DOUBLE) / n1"
            "          - CAST(sx0 AS DOUBLE) / n0, 0.0)", 6
        )} AS wald_late
    FROM w
    """,
)
def q_wald_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald instrumental-variable estimator (C238): with user parity
    as a binary instrument (the "encouragement arm" stand-in), the
    LATE of one additional purchase on purchase revenue is
    (ȳ₁−ȳ₀)/(x̄₁−x̄₀) — both intent-to-treat differences reported
    alongside. The ratio-of-reduced-forms shape every IV design
    collapses to with a binary instrument; near-zero itt_x flags a
    weak instrument (the ratio blows up — exactly what the fixture
    parity instrument exhibits, which the gate pins).

    Determinism: per-user exposure counts and cent revenues are exact
    integers, per-arm sums exact (HUGEINT for cent mass); the three
    emitted statistics are fixed guarded expressions, srnd6.

    Scale shape: groupBy(user) collapses events to one row per user
    (map-side combined), then ONE 2-row arm aggregate — sufficient
    statistics all the way down.
    """
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", (F.col("user_id") % 2).cast("long").alias("z"))
        .agg(
            F.count(
                F.when(F.col("event_type") == "purchase", F.lit(1))
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("y"),
        )
    )
    dec = "decimal(38,0)"
    g = u.groupBy("z").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("z") == zv, F.col(c))).alias(f"{c}{zv}")
            for zv in (1, 0)
            for c in ("n", "sx", "sy")
        ]
    )
    n1, n0 = F.col("n1").cast("double"), F.col("n0").cast("double")
    dy = (
        F.col("sy1").cast("double") / n1 / 100.0
        - F.col("sy0").cast("double") / n0 / 100.0
    )
    dx = F.col("sx1").cast("double") / n1 - F.col("sx0").cast("double") / n0
    return w.select(
        F.col("n0").alias("n_users_0"),
        F.col("n1").alias("n_users_1"),
        srnd(dy, 6).alias("itt_y"),
        srnd(dx, 6).alias("itt_x"),
        srnd(dy / F.nullif(dx, F.lit(0.0)), 6).alias("wald_late"),
    )


# ------------------------------- C239 sharp regression discontinuity

_RDD_CUT = 15_000_000  # cents ($150k) — near the totalprice median
_RDD_BW = 5_000_000  # ±$50k local-linear bandwidth


@query(
    "q_rdd_lite",
    oracle=f"""
    WITH base AS (
        SELECT CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   - {_RDD_CUT} AS u,
               li.y
        FROM orders o
        JOIN (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS y
              FROM lineitem GROUP BY 1) li
          ON li.l_orderkey = o.o_orderkey
        WHERE abs(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                  - {_RDD_CUT}) < {_RDD_BW}
    ),
    sides AS (
        SELECT (u >= 0) AS right_side,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(u) AS HUGEINT) AS su,
            CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS suu,
            CAST(sum(y) AS HUGEINT) AS sy,
            CAST(sum(CAST(u AS HUGEINT) * y) AS HUGEINT) AS suy
        FROM base GROUP BY 1
    ),
    fits AS (
        SELECT right_side, n,
            {sql_srnd(
                "(CAST(suu AS DOUBLE) * CAST(sy AS DOUBLE)"
                " - CAST(su AS DOUBLE) * CAST(suy AS DOUBLE))"
                " / nullif(CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)"
                "          - CAST(su AS DOUBLE) * CAST(su AS DOUBLE),"
                " 0.0)", 6
            )} AS y_at_cut
        FROM sides
    )
    SELECT
        max(CASE WHEN NOT right_side THEN n END) AS n_left,
        max(CASE WHEN right_side THEN n END) AS n_right,
        max(CASE WHEN NOT right_side THEN y_at_cut END) AS y0_left,
        max(CASE WHEN right_side THEN y_at_cut END) AS y0_right,
        {sql_srnd(
            "max(CASE WHEN right_side THEN y_at_cut END)"
            " - max(CASE WHEN NOT right_side THEN y_at_cut END)", 6
        )} AS rdd_effect
    FROM fits
    """,
)
def q_rdd_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity (C239): local linear fits on
    each side of a $150k order-value cutoff (±$50k bandwidth —
    _RDD_CUT/_RDD_BW in cents), outcome = the order's
    lineitem count; the effect is the jump between the two intercepts
    AT the cutoff — the quasi-experimental design for any
    threshold-assigned treatment (free shipping, priority handling).
    On TPC-H's threshold-free data the gate pins the placebo: effect
    ≈ 0.

    Determinism: the running variable is exact cents re-centered at
    the cutoff; per-side OLS sufficient statistics (n, Σu, Σu², Σy,
    Σuy) are exact wide integers (Σu² crosses int64 in-bandwidth by
    sf1); each intercept-at-0 is one fixed guarded expression
    srnd6'd; the effect subtracts the two QUANTIZED intercepts.

    Scale shape: the per-order outcome is a map-side-combined
    lineitem groupBy joined on orderkey (the bandwidth filter pushes
    into the orders scan); both sides collapse to one
    sufficient-statistics row each.
    """
    o = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").cast("long").alias("y"))
    )
    u = (
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        - _RDD_CUT
    )
    base = (
        o.select("o_orderkey", u.alias("u"))
        .filter(F.abs(F.col("u")) < _RDD_BW)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .select("u", "y")
    )
    dec = "decimal(38,0)"
    sides = base.groupBy((F.col("u") >= 0).alias("right_side")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("u").cast(dec).alias("su"),
        F.sum(F.col("u").cast(dec) * F.col("u")).alias("suu"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("u").cast(dec) * F.col("y")).alias("suy"),
    )
    y_at_cut = srnd(
        (
            F.col("suu").cast("double") * F.col("sy").cast("double")
            - F.col("su").cast("double") * F.col("suy").cast("double")
        )
        / F.nullif(
            F.col("n").cast("double") * F.col("suu").cast("double")
            - F.col("su").cast("double") * F.col("su").cast("double"),
            F.lit(0.0),
        ),
        6,
    )
    fits = sides.select("right_side", "n", y_at_cut.alias("y_at_cut"))
    pick = lambda side, c: F.max(  # noqa: E731
        F.when(F.col("right_side") == side, F.col(c))
    )
    return fits.agg(
        pick(False, "n").alias("n_left"),
        pick(True, "n").alias("n_right"),
        pick(False, "y_at_cut").alias("y0_left"),
        pick(True, "y_at_cut").alias("y0_right"),
        srnd(
            pick(True, "y_at_cut") - pick(False, "y_at_cut"), 6
        ).alias("rdd_effect"),
    )


# --------------------------- C240 Horvitz–Thompson stratified total

_HT_SHORT = 1000  # n_chars threshold splitting the strata
_HT_MOD_SHORT = 4  # short docs sampled at pi = 1/4
_HT_MOD_LONG = 2  # long docs at pi = 1/2


@query(
    "q_horvitz_thompson",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
               CASE WHEN n_chars < {_HT_SHORT}
                    THEN 'short' ELSE 'long' END AS stratum,
               CASE WHEN n_chars < {_HT_SHORT}
                    THEN {_HT_MOD_SHORT} ELSE {_HT_MOD_LONG} END AS m
        FROM documents
    )
    SELECT stratum,
           CAST(count(*) AS BIGINT) AS n_pop,
           CAST(count(CASE WHEN doc_id % m = 0 THEN 1 END) AS BIGINT)
               AS n_sampled,
           CAST(sum(x) AS BIGINT) AS true_total,
           CAST(sum(CASE WHEN doc_id % m = 0 THEN x * m ELSE 0 END)
                AS BIGINT) AS ht_total,
           {sql_srnd(
               "CAST(sum(CASE WHEN doc_id % m = 0 THEN x * m ELSE 0 END)"
               "     AS DOUBLE) / nullif(CAST(sum(x) AS DOUBLE), 0.0)", 6
           )} AS ht_ratio
    FROM d GROUP BY stratum
    """,
)
def q_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz–Thompson stratified total (C240): estimate the corpus
    character mass from a deterministic unequal-probability sample —
    short documents kept at π = 1/{ms}, long at π = 1/{ml} — via the
    HT estimator Σ_sample x/π, per stratum, next to the true total
    and their ratio. The design-based answer to "what does my
    stratified subsample SAY about the full corpus": C8 chooses the
    sample, HT is how every downstream count/mass statistic must be
    reweighted (π⁻¹ expansion), and the ratio gate pins the estimator
    ≈ 1 on the dense-id fixtures.

    Determinism: membership is id-arithmetic (doc_id mod — the repo's
    hash-free deterministic sampling convention, identical in both
    engines); totals are exact integers (x·π⁻¹ is an integer by
    construction of the mod designs); one srnd6 ratio.

    Scale shape: a single map-side-combining groupBy(stratum) with
    conditional sums — the whole estimator is one corpus pass, which
    is the point of HT at 100 TB (no second pass to calibrate).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x"),
        F.when(F.col("n_chars") < _HT_SHORT, F.lit("short"))
        .otherwise(F.lit("long"))
        .alias("stratum"),
        F.when(
            F.col("n_chars") < _HT_SHORT, F.lit(_HT_MOD_SHORT)
        )
        .otherwise(F.lit(_HT_MOD_LONG))
        .alias("m"),
    )
    sampled = F.col("doc_id") % F.col("m") == 0
    return d.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_pop"),
        F.count(F.when(sampled, F.lit(1))).cast("long").alias("n_sampled"),
        F.sum("x").cast("long").alias("true_total"),
        F.sum(F.when(sampled, F.col("x") * F.col("m")).otherwise(F.lit(0)))
        .cast("long")
        .alias("ht_total"),
        srnd(
            F.sum(
                F.when(sampled, F.col("x") * F.col("m")).otherwise(F.lit(0))
            ).cast("double")
            / F.nullif(F.sum("x").cast("double"), F.lit(0.0)),
            6,
        ).alias("ht_ratio"),
    )


q_horvitz_thompson.__doc__ = q_horvitz_thompson.__doc__.format(
    ms=_HT_MOD_SHORT, ml=_HT_MOD_LONG
)
