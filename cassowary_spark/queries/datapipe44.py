"""Round-9 wave 46 (SURVEY.md §2): group-sequential experiment
monitoring (C181) and minimum-detectable-effect sizing (C182).

Both complete the experiment-operations battery around C139's
one-shot z-test: C176 gates the assignment, C181 monitors the metric
at interim looks WITHOUT inflating false positives (the peeking
problem), C182 answers "how long must this test run" from the
variance the data already exhibits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# --------------------------- C181 group-sequential monitoring (OBF)

# O'Brien-Fleming two-sided 5% z-boundaries for K=4 equally-informed
# looks: z_k = z_OBF · sqrt(K/k) with z_OBF ≈ 2.0243. Compile-time
# constants (the C156 staircase discipline: the only transcendental
# inverse runs in documentation, not in either engine).
_GS_BOUNDS = (4.0486, 2.8628, 2.3375, 2.0243)
_GS_BOUNDS_SQL = "[" + ", ".join(str(b) for b in _GS_BOUNDS) + "]"


@query(
    "q_sequential_probe",
    oracle=f"""
    WITH e AS (
        SELECT CAST((day(ts) - 1) // 7 AS INT) AS wk,
               CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                        1, 8) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END AS t,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    per_wk AS (
        SELECT CASE WHEN wk > 3 THEN 3 ELSE wk END AS look,
               CAST(sum(t) AS BIGINT) AS n_t,
               CAST(count(*) - sum(t) AS BIGINT) AS n_c,
               CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS s_t,
               CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS s_c,
               CAST(sum(CASE WHEN t = 1 THEN cents * cents ELSE 0 END)
                    AS BIGINT) AS q_t,
               CAST(sum(CASE WHEN t = 0 THEN cents * cents ELSE 0 END)
                    AS BIGINT) AS q_c
        FROM e GROUP BY 1
    ),
    cum AS (
        SELECT look,
               CAST(sum(n_t) OVER w AS BIGINT) AS n_t,
               CAST(sum(n_c) OVER w AS BIGINT) AS n_c,
               CAST(sum(s_t) OVER w AS BIGINT) AS s_t,
               CAST(sum(s_c) OVER w AS BIGINT) AS s_c,
               CAST(sum(q_t) OVER w AS BIGINT) AS q_t,
               CAST(sum(q_c) OVER w AS BIGINT) AS q_c
        FROM per_wk
        WINDOW w AS (ORDER BY look
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    z AS (
        SELECT look + 1 AS look, n_t, n_c,
               {sql_srnd(
                   "(CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
                   " - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
                   " / (100.0 * sqrt("
                   "   (CAST(q_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
                   "    - (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))"
                   "      * (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)))"
                   "   / (10000.0 * CAST(n_t AS DOUBLE))"
                   " + (CAST(q_c AS DOUBLE) / CAST(n_c AS DOUBLE)"
                   "    - (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
                   "      * (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)))"
                   "   / (10000.0 * CAST(n_c AS DOUBLE))))",
                   6)} AS z_k
        FROM cum
    )
    SELECT CAST(look AS INT) AS look, n_t, n_c, z_k,
           CAST(CASE WHEN abs(z_k) > ({_GS_BOUNDS_SQL})[look]
                THEN 1 ELSE 0 END AS INT) AS crossed
    FROM z
    """,
)
def q_sequential_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential experiment monitor (C181): the treated-vs-
    control z statistic of event value re-computed at four weekly
    interim looks over CUMULATIVE data, each compared to its
    O'Brien-Fleming boundary (z·√(K/k): 4.05, 2.86, 2.34, 2.02) —
    the standard answer to the peeking problem (naive repeated
    z>1.96 checks inflate the false-positive rate ~3x at 4 looks;
    OBF spends almost no alpha early and the final look costs
    nearly the fixed-horizon 1.96). Treatment is the C94 hash bit,
    so the fixture's truth is "never crosses" (gate-pinned), and a
    planted shifted fixture must cross at the first sufficiently-
    informed look.

    Determinism: per-week cells carry exact BIGINT Σcents and
    Σcents² (the Welford-free two-pass-free variance identity);
    cumulative sums run over ≤4 rows; each z_k is one fixed IEEE
    expression srnd6'd, and the crossing flag compares the QUANTIZED
    z to a literal boundary (the C156 staircase discipline — the
    only transcendental inverse ran offline to produce the four
    constants).

    Scale shape: ONE pass of conditional aggregates to 4 cells; the
    cumulative window and boundary compares are arithmetic over 4
    rows. At 100 TB each look is the same partial-agg a metrics
    dashboard already materializes daily.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    t = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 1
    ).cast("int")
    e = ev.select(
        F.least(
            ((F.dayofmonth("ts") - 1) / 7).cast("int"), F.lit(3)
        ).alias("look0"),
        t.alias("t"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    per = e.groupBy("look0").agg(
        F.sum("t").cast("long").alias("n_t"),
        (F.count("*") - F.sum("t")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s_t"),
        F.sum(F.when(F.col("t") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s_c"),
        F.sum(
            F.when(F.col("t") == 1, F.col("cents") * F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("q_t"),
        F.sum(
            F.when(F.col("t") == 0, F.col("cents") * F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("q_c"),
    )
    w = Window.orderBy("look0").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "look0",
        *[
            F.sum(c).over(w).cast("long").alias(c)
            for c in ("n_t", "n_c", "s_t", "s_c", "q_t", "q_c")
        ],
    )
    mt = F.col("s_t").cast("double") / F.col("n_t").cast("double")
    mc = F.col("s_c").cast("double") / F.col("n_c").cast("double")
    vt = (
        F.col("q_t").cast("double") / F.col("n_t").cast("double") - mt * mt
    ) / (10000.0 * F.col("n_t").cast("double"))
    vc = (
        F.col("q_c").cast("double") / F.col("n_c").cast("double") - mc * mc
    ) / (10000.0 * F.col("n_c").cast("double"))
    z = srnd((mt - mc) / (100.0 * F.sqrt(vt + vc)), 6)
    bounds = F.array(*[F.lit(b) for b in _GS_BOUNDS])
    return cum.select(
        (F.col("look0") + 1).cast("int").alias("look"),
        "n_t",
        "n_c",
        z.alias("z_k"),
        F.when(
            F.abs(z) > F.element_at(bounds, (F.col("look0") + 1).cast("int")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("crossed"),
    )


# ------------------------------- C182 minimum detectable effect

_MDE_Z = 1.959964 + 0.841621  # z_{0.025} + z_{0.20}: 80% power, 5% two-sided


@query(
    "q_mde_sizing",
    oracle=f"""
    WITH e AS (
        SELECT event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    cells AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS q
        FROM e GROUP BY 1
    )
    SELECT event_type, n,
           {sql_srnd(
               "CAST(s AS DOUBLE) / (100.0 * CAST(n AS DOUBLE))", 6)} AS mean,
           {sql_srnd(
               "{z} * sqrt(2.0 * (CAST(q AS DOUBLE) / CAST(n AS DOUBLE)"
               " - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
               "   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))"
               " / (10000.0 * (CAST(n AS DOUBLE) / 2.0)))", 6).format(
                   z=_MDE_Z)} AS mde_abs,
           {sql_srnd(
               "100.0 * {z} * sqrt(2.0 * (CAST(q AS DOUBLE)"
               " / CAST(n AS DOUBLE)"
               " - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
               "   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))"
               " / (10000.0 * (CAST(n AS DOUBLE) / 2.0)))"
               " / nullif(CAST(s AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)),"
               " 0.0)", 6).format(z=_MDE_Z)} AS mde_rel_pct
    FROM cells
    """,
)
def q_mde_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-detectable-effect sizing (C182): for each event type,
    the smallest mean-value lift a 50/50 experiment over the
    CURRENT traffic could detect at 80% power / 5% two-sided —
    MDE = (z_{{α/2}}+z_β)·√(2σ²/(n/2)) — absolute and as % of the
    mean. The capacity-planning half of the experiment battery:
    C139 tests an effect after the fact, C181 monitors it, this
    says UP FRONT whether the test is worth running ("your traffic
    can only see a 4% lift — don't A/B a 1% hope"). The z-constant
    sum is a compile-time literal (C156 discipline).

    Determinism: per-type n, Σcents, Σcents² are exact BIGINTs in
    one pass; variance, MDE, and the relative form are single fixed
    IEEE expressions srnd6'd; the degenerate zero-mean guard is the
    same nullif both engines spell.

    Scale shape: one map-side-combining groupBy to |event_types|
    rows; everything after is row-local arithmetic on that frame.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    cells = ev.select(
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    ).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
    )
    mean = F.col("s").cast("double") / (100.0 * F.col("n").cast("double"))
    var_c2 = (
        F.col("q").cast("double") / F.col("n").cast("double")
        - (F.col("s").cast("double") / F.col("n").cast("double"))
        * (F.col("s").cast("double") / F.col("n").cast("double"))
    )
    mde = F.lit(_MDE_Z) * F.sqrt(
        2.0 * var_c2 / (10000.0 * (F.col("n").cast("double") / 2.0))
    )
    return cells.select(
        "event_type",
        "n",
        srnd(mean, 6).alias("mean"),
        srnd(mde, 6).alias("mde_abs"),
        srnd(100.0 * mde / F.nullif(mean, F.lit(0.0)), 6).alias(
            "mde_rel_pct"
        ),
    )
