"""Round-12 wave 69 (SURVEY.md §2): optimizer- and ops-statistics
operators — inter-event gap histogram (C245), funnel conversion with
Wilson intervals (C246), a predicate-selectivity profile (C247) and
join-cardinality estimation vs ground truth (C248).

C245 profiles the arrival process C23/C81 sessionize over (the gap
distribution IS the evidence for a session timeout choice); C246
puts confidence bounds on C52's funnel rates (a 2% step drop on 300
users is noise; on 3M it's real — Wilson says which); C247/C248 are
the cost-model primitives a Catalyst-style optimizer feeds on:
per-column equality selectivity and join-output cardinality, both
computed EXACTLY from counts frames next to the independence-
assumption estimates whose error the optimizer actually suffers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------ C245 inter-event gap histogram


@query(
    "q_gap_histogram",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id,
               CAST(floor(date_part('epoch', ts))
                    - floor(date_part('epoch', lag(ts) OVER w))
                    AS BIGINT) AS gap_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    b AS (
        SELECT CAST(floor(ln(CAST(gap_s AS DOUBLE))
                          / ln(2.0)) AS BIGINT) AS bucket
        FROM gaps WHERE gap_s IS NOT NULL AND gap_s > 0
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           {sql_srnd(
               "CAST(count(*) AS DOUBLE)"
               " / CAST(sum(count(*)) OVER () AS DOUBLE)", 6
           )} AS share
    FROM b GROUP BY bucket
    """,
)
def q_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram (C245): per-user consecutive-event
    gaps, bucketed by log₂(seconds) — the arrival-process profile
    that JUSTIFIES a session timeout choice (C23/C81 assume one; the
    bimodal gap histogram — within-session seconds vs between-session
    hours — is where the number comes from).

    Determinism: gaps are integer SECONDS, epoch-floored on both
    engines before differencing (the C81 convention — µs-vs-ns
    timestamp resolution cannot skew a gap) and ordered by event_id;
    the bucket is floor(ln(gap_s)/ln 2) — one fixed float expression
    on an exact integer (log₂ spelled as ln/ln so both engines
    evaluate the identical tree); shares are exact-count ratios over
    the bucket frame's own window total (no eager count in the
    builder — r10 rule), srnd6.

    Scale shape: the lag runs in user-PARTITIONED windows (parallel
    by key — the sessionize shape); the histogram is a map-side
    combining groupBy over ≤ ~60 log buckets, and the share window
    orders that bucket frame only.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    sec = F.floor(F.col("ts").cast("double"))
    gaps = ev.select(
        (sec - F.lag(sec).over(w)).cast("long").alias("gap_s")
    ).filter(F.col("gap_s").isNotNull() & (F.col("gap_s") > 0))
    b = gaps.select(
        F.floor(
            F.log(F.col("gap_s").cast("double")) / F.log(F.lit(2.0))
        )
        .cast("long")
        .alias("bucket")
    )
    counts = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_gaps")
    )
    return counts.select(
        "bucket",
        "n_gaps",
        srnd(
            F.col("n_gaps").cast("double")
            / F.sum("n_gaps").over(Window.partitionBy()).cast("double"),
            6,
        ).alias("share"),
    )


# -------------------------------- C246 funnel rates with Wilson CIs

_WILSON_Z = 1.959963985  # 95%, spelled as the same literal both sides
_FUNNEL_STEPS = ("view", "click", "purchase")


def _wilson_sql(p: str, n: str, sign: str) -> str:
    z = _WILSON_Z
    return (
        f"(({p}) + {z * z} / (2.0 * ({n})) {sign} {z} * sqrt("
        f"(({p}) * (1.0 - ({p})) + {z * z} / (4.0 * ({n}))) / ({n})))"
        f" / (1.0 + {z * z} / ({n}))"
    )


@query(
    "q_funnel_wilson",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
            max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s0,
            max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS s1,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s2
        FROM events GROUP BY user_id
    ),
    steps AS (
        SELECT 'view->click' AS step,
               CAST(sum(s0) AS BIGINT) AS n_base,
               CAST(sum(CASE WHEN s0 = 1 AND s1 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_conv
        FROM per_user
        UNION ALL
        SELECT 'click->purchase',
               CAST(sum(s1) AS BIGINT),
               CAST(sum(CASE WHEN s1 = 1 AND s2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM per_user
    ),
    rated AS (
        SELECT step, n_base, n_conv,
               CAST(n_conv AS DOUBLE) / n_base AS p
        FROM steps WHERE n_base > 0
    )
    SELECT step, n_base, n_conv,
           {sql_srnd("p", 6)} AS rate,
           {sql_srnd(_wilson_sql("p", "n_base", "-"), 6)} AS wilson_lo,
           {sql_srnd(_wilson_sql("p", "n_base", "+"), 6)} AS wilson_hi
    FROM rated
    """,
)
def q_funnel_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion with Wilson 95% intervals (C246): per-user
    reached-step flags for view→click→purchase, each step's
    conversion rate bracketed by the Wilson score interval — the
    binomial CI that stays inside [0,1] and behaves at small counts,
    i.e. the error bars C52's funnel NEEDS before anyone reads a 2%
    step drop as real.

    Determinism: reached flags and conversions are exact integer
    counts; the rate and both Wilson bounds are fixed IEEE
    expressions (z spelled as the same 1.959963985 literal in both
    engines), srnd6.

    Scale shape: ONE groupBy(user) pass builds the flags (map-side
    combined), one 2-row conditional reduce builds the steps — the
    funnel never materializes event pairs.
    """
    ev = load_table(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == t, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(f"s{i}")
            for i, t in enumerate(_FUNNEL_STEPS)
        ]
    )
    steps = None
    names = ["view->click", "click->purchase"]
    for i, name in enumerate(names):
        part = flags.agg(
            F.lit(name).alias("step"),
            F.sum(F.col(f"s{i}")).cast("long").alias("n_base"),
            F.sum(
                F.when(
                    (F.col(f"s{i}") == 1) & (F.col(f"s{i + 1}") == 1),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_conv"),
        )
        steps = part if steps is None else steps.unionByName(part)
    rated = steps.filter(F.col("n_base") > 0)
    p = F.col("n_conv").cast("double") / F.col("n_base").cast("double")
    n = F.col("n_base").cast("double")
    z = _WILSON_Z
    half = z * F.sqrt((p * (1.0 - p) + z * z / (4.0 * n)) / n)
    denom = 1.0 + z * z / n
    return rated.select(
        "step",
        "n_base",
        "n_conv",
        srnd(p, 6).alias("rate"),
        srnd((p + z * z / (2.0 * n) - half) / denom, 6).alias("wilson_lo"),
        srnd((p + z * z / (2.0 * n) + half) / denom, 6).alias("wilson_hi"),
    )


# ------------------------------- C247 predicate-selectivity profile

_SEL_COLS = ("source", "lang")


@query(
    "q_selectivity_profile",
    oracle=f"""
    WITH {", ".join(
        f'''c_{c} AS (
            SELECT '{c}' AS col,
                   CAST(count(*) AS BIGINT) AS ndv,
                   CAST(max(cnt) AS BIGINT) AS top1,
                   CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS s2
            FROM (SELECT {c}, count(*) AS cnt
                  FROM documents GROUP BY {c})
        )''' for c in _SEL_COLS
    )},
    u AS (
        {" UNION ALL ".join(f"SELECT * FROM c_{c}" for c in _SEL_COLS)}
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
    SELECT col, ndv,
           {sql_srnd(
               "CAST(top1 AS DOUBLE) / (SELECT total FROM tot)", 6
           )} AS top1_share,
           {sql_srnd(
               "CAST(s2 AS DOUBLE) / ((SELECT total FROM tot)"
               " * CAST((SELECT total FROM tot) AS DOUBLE))", 6
           )} AS eq_selectivity,
           {sql_srnd("1.0 / ndv", 6)} AS uniform_selectivity
    FROM u
    """,
)
def q_selectivity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-selectivity profile (C247): per categorical column,
    the NDV, the top-value share, the TRUE expected selectivity of a
    value-weighted equality predicate — Σ(c_v/N)², i.e. the
    self-collision probability — and the UNIFORM assumption 1/ndv a
    naive optimizer uses. The gap between the last two columns is
    exactly the skew-induced cardinality-estimation error (ANALYZE
    FOR COLUMNS distilled to the number the cost model consumes;
    C30's skew stats feed the same decision).

    Determinism: value counts exact; Σc² in HUGEINT/DECIMAL(38,0);
    per-column fixed srnd6 ratios. Note ndv here is EXACT (the
    statistic being audited) — the approx path at 100 TB is B16's
    HLL, whose error this exact profile calibrates. ndv counts the
    GROUP domain — a NULL value is one group on BOTH engines (oracle
    counts grouped rows, not count(DISTINCT col), which would skip
    the NULL group and skew ndv/uniform_selectivity by one against
    the Spark count on a dirty ingest — r12 ADVICE).

    Scale shape: one map-side-combining groupBy per column over the
    value domain (categorical — bounded), unioned; nothing after the
    collapse exceeds the domain size.
    """
    d = load_table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    parts = []
    for c in _SEL_COLS:
        cnt = d.groupBy(c).agg(F.count("*").cast("long").alias("cnt"))
        parts.append(
            cnt.agg(
                F.lit(c).alias("col"),
                F.count("*").cast("long").alias("ndv"),
                F.max("cnt").cast("long").alias("top1"),
                F.sum(F.col("cnt").cast(dec) * F.col("cnt")).alias("s2"),
            )
        )
    u = parts[0]
    for p_ in parts[1:]:
        u = u.unionByName(p_)
    # 1-row broadcast total — no eager count in the builder (r10 rule)
    tot = d.agg(F.count("*").cast("long").alias("total"))
    j = u.crossJoin(F.broadcast(tot))
    t = F.col("total").cast("double")
    return j.select(
        "col",
        "ndv",
        srnd(F.col("top1").cast("double") / t, 6).alias("top1_share"),
        srnd(F.col("s2").cast("double") / (t * t), 6).alias(
            "eq_selectivity"
        ),
        srnd(1.0 / F.col("ndv").cast("double"), 6).alias(
            "uniform_selectivity"
        ),
    )


# --------------------------- C248 join-cardinality estimate vs truth


@query(
    "q_join_card_est",
    oracle=f"""
    WITH c AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ),
    agg AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS ndv,
               CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS actual
        FROM c
    )
    SELECT n AS n_rows, ndv,
           CAST(actual AS BIGINT) AS actual_selfjoin,
           CAST(CAST(n AS HUGEINT) * n // ndv AS BIGINT) AS indep_est,
           {sql_srnd(
               "CAST(actual AS DOUBLE)"
               " / (CAST(n AS DOUBLE) * n / ndv)", 6
           )} AS skew_factor
    FROM agg
    """,
)
def q_join_card_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit (C248): the EXACT output
    size of the lineitem partkey self-join, Σ c(k)², computed from
    the per-key counts frame WITHOUT materializing a single join row,
    next to the uniform-frequency estimate N²/ndv every textbook
    optimizer starts from — their ratio is the skew factor that
    decides whether a planned join explodes (the estimation primitive
    behind B13b's skew-join salting and AQE's runtime re-plan).

    Determinism: pure integer counting (Σc² and N²/ndv in
    HUGEINT/DECIMAL(38,0) — both cross int64 by sf10), explicit
    FLOOR division for the estimate on both engines (DuckDB `//`,
    Spark F.floor of the decimal quotient — scale-independent
    exact), one srnd6 ratio.

    Scale shape: ONE map-side-combining groupBy(key) then a 1-row
    reduce — the audit costs one pass over the fact table where the
    join it predicts would cost Σc² rows; that asymmetry is the
    point.
    """
    dec = "decimal(38,0)"
    c = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    agg = c.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count("*").cast("long").alias("ndv"),
        F.sum(F.col("cnt").cast(dec) * F.col("cnt")).alias("actual"),
    )
    n = F.col("n").cast(dec)
    return agg.select(
        F.col("n").alias("n_rows"),
        "ndv",
        F.col("actual").cast("long").alias("actual_selfjoin"),
        # exact integer floor-division on both engines (r13 ADVICE):
        # DuckDB uses HUGEINT `//`; Spark's decimal division rounds
        # HALF_UP to the adjusted scale BEFORE a floor could apply, so
        # floor(n²/ndv) over the decimal quotient is off by one
        # whenever frac(n²/ndv) lands within 5e-7 of 1 (reachable at
        # ndv ≳ 1e6, i.e. sf10+). The subtract-remainder identity
        # (n² − n² mod ndv)/ndv divides exactly — the quotient is
        # integral, so decimal rounding is a no-op at ANY scale (the
        # counts_bands idiom).
        ((n * F.col("n") - F.pmod(n * F.col("n"), F.col("ndv")))
         / F.col("ndv"))
        .cast("long")
        .alias("indep_est"),
        srnd(
            F.col("actual").cast("double")
            / (
                F.col("n").cast("double")
                * F.col("n").cast("double")
                / F.col("ndv").cast("double")
            ),
            6,
        ).alias("skew_factor"),
    )
