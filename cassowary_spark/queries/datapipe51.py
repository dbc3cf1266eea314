"""Round-9 wave 53 (SURVEY.md §2): TOST equivalence testing (C192)
and Holm step-down multiple-testing correction (C193).

C192 closes the experiment battery's inferential directions —
superiority (C139), monitoring (C181), sizing (C182), variance
reduction (C191), and now EQUIVALENCE ("prove the cheap pipeline is
as good as the expensive one", which a non-significant t-test does
NOT prove). C193 is the guardrail for reading a FAMILY of tests at
once (per-segment dashboards): without it, five 5%-level looks carry
~23% family-wise false-positive risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# -------------------------------------- C192 TOST equivalence test

_TOST_MARGIN_CENTS = 200.0  # ±2.00 value-units equivalence margin
_TOST_Z = 1.644854  # z_{0.05}: one-sided 5% per bound


@query(
    "q_tost_equivalence",
    oracle=f"""
    WITH m AS (
        SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                     1, 8) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END AS t,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    s AS (
        SELECT
            CAST(sum(t) AS BIGINT) AS n_t,
            CAST(count(*) - sum(t) AS BIGINT) AS n_c,
            CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_t,
            CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_c,
            CAST(sum(CASE WHEN t = 1 THEN cents * cents ELSE 0 END)
                 AS BIGINT) AS q_t,
            CAST(sum(CASE WHEN t = 0 THEN cents * cents ELSE 0 END)
                 AS BIGINT) AS q_c
        FROM m
    ),
    d AS (
        SELECT n_t, n_c,
               {sql_srnd(
                   "CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
                   " - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)",
                   8)} AS diff_cents,
               {sql_srnd(
                   "sqrt((CAST(q_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
                   "  - (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))"
                   "    * (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)))"
                   "  / CAST(n_t AS DOUBLE)"
                   " + (CAST(q_c AS DOUBLE) / CAST(n_c AS DOUBLE)"
                   "  - (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
                   "    * (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)))"
                   "  / CAST(n_c AS DOUBLE))", 8)} AS se_cents
        FROM s
    )
    SELECT n_t, n_c,
           {sql_srnd("diff_cents / 100.0", 6)} AS diff,
           {sql_srnd(
               "(diff_cents + {m}) / nullif(se_cents, 0.0)",
               6).replace("{m}", "{margin}")} AS z_lower,
           {sql_srnd(
               "({m} - diff_cents) / nullif(se_cents, 0.0)",
               6).replace("{m}", "{margin}")} AS z_upper,
           CAST(CASE WHEN
               least({sql_srnd(
                   "(diff_cents + {m}) / nullif(se_cents, 0.0)",
                   6).replace("{m}", "{margin}")},
                   {sql_srnd(
                       "({m} - diff_cents) / nullif(se_cents, 0.0)",
                       6).replace("{m}", "{margin}")})
               > {_TOST_Z} THEN 1 ELSE 0 END AS INT) AS equivalent
    FROM d
    """.replace("{margin}", str(_TOST_MARGIN_CENTS)),
)
def q_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (C192): two one-sided z tests of the
    treated-vs-control mean difference against the ±2.00 margin —
    equivalent iff BOTH z_lower = (d+δ)/SE and z_upper = (δ−d)/SE
    exceed z₀.₀₅, i.e. the 90% CI of the difference sits inside the
    margin. The direction the experiment battery lacked: a
    non-significant C139 z does NOT prove "no difference" (absence
    of evidence), TOST does — the test behind "the cheap pipeline /
    new infra / sampled metric is interchangeable with the old one".
    On the hash-randomized fixture the true difference is 0, so
    equivalence HOLDS at any healthy traffic level (gate-pinned, as
    is the planted too-large-shift rejection).

    Determinism: exact BIGINT Σ/Σ² per arm in one pass; diff and SE
    srnd8'd; the two z's are fixed expressions srnd6'd and the flag
    compares the QUANTIZED min to the literal critical value (C156
    discipline — both constants compile-time).

    Scale shape: one conditional-agg pass to a single row; pure
    arithmetic after.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    t = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 1
    ).cast("int")
    m = ev.select(
        t.alias("t"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    s = m.agg(
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
    mt = F.col("s_t").cast("double") / F.col("n_t").cast("double")
    mc = F.col("s_c").cast("double") / F.col("n_c").cast("double")
    diff = srnd(mt - mc, 8)
    se = srnd(
        F.sqrt(
            (F.col("q_t").cast("double") / F.col("n_t").cast("double") - mt * mt)
            / F.col("n_t").cast("double")
            + (
                F.col("q_c").cast("double") / F.col("n_c").cast("double")
                - mc * mc
            )
            / F.col("n_c").cast("double")
        ),
        8,
    )
    d = s.select("n_t", "n_c", diff.alias("diff_cents"), se.alias("se_cents"))
    zl = srnd(
        (F.col("diff_cents") + _TOST_MARGIN_CENTS)
        / F.nullif(F.col("se_cents"), F.lit(0.0)),
        6,
    )
    zu = srnd(
        (_TOST_MARGIN_CENTS - F.col("diff_cents"))
        / F.nullif(F.col("se_cents"), F.lit(0.0)),
        6,
    )
    return d.select(
        "n_t",
        "n_c",
        srnd(F.col("diff_cents") / 100.0, 6).alias("diff"),
        zl.alias("z_lower"),
        zu.alias("z_upper"),
        F.when(F.least(zl, zu) > _TOST_Z, 1)
        .otherwise(0)
        .cast("int")
        .alias("equivalent"),
    )


# --------------------------------- C193 Holm step-down correction

# z thresholds for one test at two-sided alpha = .05/j, j = 1..8
# (Phi^{-1}(1 - .025/j) — computed offline, the C156 discipline)
_HOLM_Z = (
    1.959964, 2.241403, 2.394180, 2.497705,
    2.575829, 2.638257, 2.690110, 2.734370,
)
_HOLM_Z_SQL = "[" + ", ".join(str(z) for z in _HOLM_Z) + "]"


@query(
    "q_holm_correction",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                        1, 8) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END AS t,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    cells AS (
        SELECT event_type,
            CAST(sum(t) AS BIGINT) AS n_t,
            CAST(count(*) - sum(t) AS BIGINT) AS n_c,
            CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_t,
            CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_c,
            CAST(sum(CASE WHEN t = 1 THEN cents * cents ELSE 0 END)
                 AS BIGINT) AS q_t,
            CAST(sum(CASE WHEN t = 0 THEN cents * cents ELSE 0 END)
                 AS BIGINT) AS q_c
        FROM m GROUP BY 1
    ),
    z AS (
        SELECT event_type,
               {sql_srnd(
                   "(CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
                   " - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
                   " / nullif(sqrt("
                   "  (CAST(q_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
                   "   - (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))"
                   "     * (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)))"
                   "  / CAST(n_t AS DOUBLE)"
                   " + (CAST(q_c AS DOUBLE) / CAST(n_c AS DOUBLE)"
                   "   - (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
                   "     * (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)))"
                   "  / CAST(n_c AS DOUBLE)), 0.0)", 6)} AS z
        FROM cells
    ),
    ranked AS (
        SELECT event_type, z,
               row_number() OVER (ORDER BY abs(z) DESC, event_type) AS rnk,
               CAST(count(*) OVER () AS BIGINT) AS mm
        FROM z
    ),
    flags AS (
        SELECT event_type, z, rnk, mm,
               CASE WHEN abs(z) > ({_HOLM_Z_SQL})[
                   CAST(mm - rnk + 1 AS INT)] THEN 1 ELSE 0 END AS raw
        FROM ranked
    )
    SELECT event_type, CAST(rnk AS INT) AS rnk, z,
           CAST(min(raw) OVER (ORDER BY rnk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS INT) AS rejected
    FROM flags
    """,
)
def q_holm_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down correction (C193): per-event-type treated-vs-
    control z tests read as a FAMILY — order by |z| descending and
    reject while |z|_k clears the threshold for level α/(m−k+1),
    stopping at the first failure (the running-min window). Five
    uncorrected 5% looks carry ~23% family-wise error; Holm holds 5%
    while uniformly beating Bonferroni — the correction every
    per-segment experiment dashboard needs before circling "the
    significant segment". The threshold ladder Φ⁻¹(1−.025/j),
    j = 1..8 is a compile-time literal array (C156 discipline); on
    the hash-randomized fixture nothing should survive (gate), while
    a planted single-segment shift must be rejected exactly and not
    drag its siblings past the gate.

    Determinism: per-type exact BIGINT moment cells in one pass;
    each z srnd6'd BEFORE the |z| ranking (with an event_type
    tiebreak) so rank order can't flip on a ulp; the step-down stop
    is a running min over ≤|types| rows.

    Scale shape: one conditional-agg pass to |types| rows; the
    ranking and running-min windows run over that marginal frame.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    t = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 1
    ).cast("int")
    m = ev.select(
        "event_type",
        t.alias("t"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    cells = m.groupBy("event_type").agg(
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
    mt = F.col("s_t").cast("double") / F.col("n_t").cast("double")
    mc = F.col("s_c").cast("double") / F.col("n_c").cast("double")
    se = F.sqrt(
        (F.col("q_t").cast("double") / F.col("n_t").cast("double") - mt * mt)
        / F.col("n_t").cast("double")
        + (F.col("q_c").cast("double") / F.col("n_c").cast("double") - mc * mc)
        / F.col("n_c").cast("double")
    )
    z = cells.select(
        "event_type",
        srnd((mt - mc) / F.nullif(se, F.lit(0.0)), 6).alias("z"),
    )
    wr = Window.orderBy(F.abs(F.col("z")).desc(), F.col("event_type"))
    ranked = z.select(
        "event_type",
        "z",
        F.row_number().over(wr).alias("rnk"),
    ).withColumn("mm", F.count("*").over(Window.partitionBy()).cast("long"))
    thr = F.array(*[F.lit(v) for v in _HOLM_Z])
    raw = F.when(
        F.abs(F.col("z"))
        > F.element_at(thr, (F.col("mm") - F.col("rnk") + 1).cast("int")),
        1,
    ).otherwise(0)
    flags = ranked.withColumn("raw", raw)
    wmin = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    return flags.select(
        "event_type",
        F.col("rnk").cast("int").alias("rnk"),
        "z",
        F.min("raw").over(wmin).cast("int").alias("rejected"),
    )
