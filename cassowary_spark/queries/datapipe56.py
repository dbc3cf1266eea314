"""Round-11 wave 59 (SURVEY.md §2): probabilistic-classifier
evaluation — PR-AUC / average precision (C209), the Brier score with
its Murphy decomposition (C210), and McNemar's paired classifier
test (C211).

C99 gave the battery ROC-AUC; these add the metrics that matter when
classes are imbalanced (PR space), when the PROBABILITIES themselves
are consumed (Brier reliability/resolution), and when two classifier
versions must be compared on the same examples (McNemar) — the three
questions a quality-filter upgrade review actually asks. All three
ride C99's counts discipline: one groupBy to the ≤1300-cell score
frame, exact BIGINTs until the final fixed expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# shared synthetic scorer (C99's): integer score 0..1299 correlated
# with the F-status label through the +300 shift
_SQL_SCORED = """
    scored AS (
        SELECT (CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                    1, 8) AS BIGINT) % 1000
                + 300 * CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    )
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return o.select((h % 1000 + 300 * y).alias("s"), y.alias("y"))


# ------------------------------- C209 PR-AUC / average precision


@query(
    "q_pr_auc",
    oracle=f"""
    WITH {_SQL_SCORED},
    by_s AS (
        SELECT s, CAST(sum(y) AS BIGINT) AS np,
               CAST(count(*) - sum(y) AS BIGINT) AS nn
        FROM scored GROUP BY 1
    ),
    c AS (
        SELECT s, np, nn,
               CAST(sum(np) OVER (ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tp,
               CAST(sum(nn) OVER (ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_fp,
               CAST(sum(np) OVER () AS BIGINT) AS p_tot,
               CAST(sum(nn) OVER () AS BIGINT) AS n_tot
        FROM by_s
    ),
    t AS (
        SELECT s, p_tot, n_tot,
               {sql_srnd(
                   "CAST(np AS DOUBLE) * CAST(cum_tp AS DOUBLE)"
                   " / (CAST(p_tot AS DOUBLE)"
                   "    * CAST(cum_tp + cum_fp AS DOUBLE))", 8)} AS term
        FROM c WHERE np > 0
    )
    SELECT CAST(max(p_tot) AS BIGINT) AS n_pos,
           CAST(max(n_tot) AS BIGINT) AS n_neg,
           {sql_srnd("list_sum(list(term ORDER BY s))", 6)} AS ap,
           {sql_srnd(
               "CAST(max(p_tot) AS DOUBLE)"
               " / CAST(max(p_tot) + max(n_tot) AS DOUBLE)", 6)}
               AS prevalence
    FROM t
    """,
)
def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR-AUC / average precision (C209): AP = Σ Δrecall·precision
    over descending score cells — the PR-space summary that, unlike
    C99's ROC-AUC, collapses toward the prevalence baseline when a
    classifier is no better than chance on an IMBALANCED class: the
    metric to gate a rare-defect quality filter on. Ties share a
    cell (standard step-wise AP on the grouped operating points —
    each distinct score is one threshold).

    Determinism: cumulative TP/FP are exact BIGINTs over the score
    cells; each cell's term np·cum_tp/(P·(cum_tp+cum_fp)) is one
    fixed IEEE expression srnd8-quantized, then summed in FIXED
    score order (the C69 fold; the oracle's ordered list_sum) —
    bit-identical across engines and partitionings.

    Scale shape: one score-keyed partial agg to ≤1300 cells (C99's
    bound), cumulative windows over THAT frame, a 1-row reduce. No
    corpus sort; sp_corpus_windows = 0.
    """
    sc = _scored(spark, sf_dir)
    by_s = sc.groupBy("s").agg(
        F.sum("y").cast("long").alias("np"),
        (F.count("*") - F.sum("y")).cast("long").alias("nn"),
    )
    wd = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    c = by_s.select(
        "s",
        "np",
        "nn",
        F.sum("np").over(wd).cast("long").alias("cum_tp"),
        F.sum("nn").over(wd).cast("long").alias("cum_fp"),
        F.sum("np").over(wt).cast("long").alias("p_tot"),
        F.sum("nn").over(wt).cast("long").alias("n_tot"),
    )
    term = srnd(
        F.col("np").cast("double")
        * F.col("cum_tp").cast("double")
        / (
            F.col("p_tot").cast("double")
            * (F.col("cum_tp") + F.col("cum_fp")).cast("double")
        ),
        8,
    )
    t = c.filter(F.col("np") > 0).select(
        "s", "p_tot", "n_tot", term.alias("term")
    )
    agg = t.agg(
        F.max("p_tot").cast("long").alias("n_pos"),
        F.max("n_tot").cast("long").alias("n_neg"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(s, term))),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"
        ).alias("__ap"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        srnd(F.col("__ap"), 6).alias("ap"),
        srnd(
            F.col("n_pos").cast("double")
            / (F.col("n_pos") + F.col("n_neg")).cast("double"),
            6,
        ).alias("prevalence"),
    )


# --------------------------- C210 Brier score, Murphy decomposition


@query(
    "q_brier_decomposition",
    oracle=f"""
    WITH {_SQL_SCORED},
    by_s AS (
        SELECT s, CAST(count(*) AS BIGINT) AS nk,
               CAST(sum(y) AS BIGINT) AS np
        FROM scored GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(nk) AS BIGINT) AS n,
               CAST(sum(np) AS BIGINT) AS pos
        FROM by_s
    ),
    t AS (
        SELECT s, nk, np,
               CAST(s AS DOUBLE) / 1300.0 AS p,
               CAST(np AS DOUBLE) / CAST(nk AS DOUBLE) AS yk,
               CAST((SELECT pos FROM tot) AS DOUBLE)
                   / CAST((SELECT n FROM tot) AS DOUBLE) AS yb
        FROM by_s
    ),
    terms AS (
        SELECT s,
               {sql_srnd(
                   "CAST(np AS DOUBLE) * (p - 1.0) * (p - 1.0)"
                   " + CAST(nk - np AS DOUBLE) * p * p", 8)} AS bterm,
               {sql_srnd(
                   "CAST(nk AS DOUBLE) * (p - yk) * (p - yk)",
                   8)} AS rterm,
               {sql_srnd(
                   "CAST(nk AS DOUBLE) * (yk - yb) * (yk - yb)",
                   8)} AS sterm
        FROM t
    )
    SELECT (SELECT n FROM tot) AS n,
           {sql_srnd(
               "list_sum(list(bterm ORDER BY s))"
               " / CAST((SELECT n FROM tot) AS DOUBLE)", 6)} AS brier,
           {sql_srnd(
               "list_sum(list(rterm ORDER BY s))"
               " / CAST((SELECT n FROM tot) AS DOUBLE)", 6)}
               AS reliability,
           {sql_srnd(
               "list_sum(list(sterm ORDER BY s))"
               " / CAST((SELECT n FROM tot) AS DOUBLE)", 6)}
               AS resolution,
           {sql_srnd(
               "(CAST((SELECT pos FROM tot) AS DOUBLE)"
               " / CAST((SELECT n FROM tot) AS DOUBLE))"
               " * (1.0 - CAST((SELECT pos FROM tot) AS DOUBLE)"
               "      / CAST((SELECT n FROM tot) AS DOUBLE))",
               6)} AS uncertainty
    FROM terms
    """,
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + Murphy decomposition (C210): mean squared error
    of the probability forecast p = s/1300 against the binary
    outcome, decomposed as Brier = reliability − resolution +
    uncertainty over the distinct-score bins — C100's calibration
    table collapsed to the three scalars a forecast review compares
    across model versions (reliability → recalibrate; resolution →
    the model actually separates; uncertainty → the task's floor).

    Determinism: every bin statistic (nk, np) is an exact BIGINT; p,
    ȳ_k, ȳ are fixed rational expressions of exact integers; each
    bin's three terms are srnd8-quantized then summed in FIXED score
    order (C69 fold / ordered list_sum); final scalars srnd6. The
    decomposition identity holds exactly in the unquantized algebra
    and to ~1e-6 after quantization (gate-checked).

    Scale shape: identical to C209 — one partial agg to score cells,
    a 1-row total, per-cell expressions, one fold over ≤1300 rows.
    """
    sc = _scored(spark, sf_dir)
    by_s = sc.groupBy("s").agg(
        F.count("*").cast("long").alias("nk"),
        F.sum("y").cast("long").alias("np"),
    )
    tot = by_s.agg(
        F.sum("nk").cast("long").alias("n"),
        F.sum("np").cast("long").alias("pos"),
    )
    t = by_s.crossJoin(F.broadcast(tot))
    p = F.col("s").cast("double") / 1300.0
    yk = F.col("np").cast("double") / F.col("nk").cast("double")
    yb = F.col("pos").cast("double") / F.col("n").cast("double")
    terms = t.select(
        "s",
        "n",
        srnd(
            F.col("np").cast("double") * (p - 1.0) * (p - 1.0)
            + (F.col("nk") - F.col("np")).cast("double") * p * p,
            8,
        ).alias("bterm"),
        srnd(F.col("nk").cast("double") * (p - yk) * (p - yk), 8).alias(
            "rterm"
        ),
        srnd(F.col("nk").cast("double") * (yk - yb) * (yk - yb), 8).alias(
            "sterm"
        ),
        yb.alias("yb"),
    )

    def fold(col: str):
        return F.expr(
            f"aggregate(array_sort(collect_list(struct(s, {col}))),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x." + col + ")"
        )

    agg = terms.agg(
        F.max("n").cast("long").alias("n"),
        fold("bterm").alias("__b"),
        fold("rterm").alias("__r"),
        fold("sterm").alias("__s"),
        F.max("yb").alias("__yb"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "n",
        srnd(F.col("__b") / nd, 6).alias("brier"),
        srnd(F.col("__r") / nd, 6).alias("reliability"),
        srnd(F.col("__s") / nd, 6).alias("resolution"),
        srnd(F.col("__yb") * (1.0 - F.col("__yb")), 6).alias("uncertainty"),
    )


# ------------------------------------ C211 McNemar's paired test


@query(
    "q_mcnemar",
    oracle="""
    WITH scored2 AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               CASE WHEN (CAST('0x' || substr(md5(CAST(o_orderkey
                              AS VARCHAR)), 1, 8) AS BIGINT) % 1000
                          + 300 * CASE WHEN o_orderstatus = 'F'
                                  THEN 1 ELSE 0 END) >= 650
                    THEN 1 ELSE 0 END AS a,
               CASE WHEN (CAST('0x' || substr(md5(CAST(o_orderkey
                              AS VARCHAR)), 9, 8) AS BIGINT) % 1000
                          + 200 * CASE WHEN o_orderstatus = 'F'
                                  THEN 1 ELSE 0 END) >= 650
                    THEN 1 ELSE 0 END AS b
        FROM orders
    ),
    m AS (
        SELECT CAST(sum(CASE WHEN a = y AND b <> y THEN 1 ELSE 0 END)
                    AS BIGINT) AS only_a,
               CAST(sum(CASE WHEN b = y AND a <> y THEN 1 ELSE 0 END)
                    AS BIGINT) AS only_b,
               CAST(sum(CASE WHEN a = y AND b = y THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_right,
               CAST(sum(CASE WHEN a <> y AND b <> y THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_wrong
        FROM scored2
    )
    SELECT only_a, only_b, both_right, both_wrong,
           floor((CAST(only_a - only_b AS DOUBLE)
                  * CAST(only_a - only_b AS DOUBLE)
                  / nullif(CAST(only_a + only_b AS DOUBLE), 0.0))
                 * 1000000.0 + 0.5) / 1000000.0 AS chi2,
           floor(((abs(CAST(only_a - only_b AS DOUBLE)) - 1.0)
                  * (abs(CAST(only_a - only_b AS DOUBLE)) - 1.0)
                  / nullif(CAST(only_a + only_b AS DOUBLE), 0.0))
                 * 1000000.0 + 0.5) / 1000000.0 AS chi2_cc
    FROM m
    """,
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (C211): compare two classifier versions
    on the SAME examples via the discordant-pair counts (only A
    right vs only B right): χ² = (b−c)²/(b+c) with the
    continuity-corrected variant — the statistically correct way to
    decide "did the new quality filter actually improve" (two
    independent C99 AUCs on the same data ignore the pairing and
    waste power). Classifier A is C99's scorer at its operating
    threshold; B is a weaker variant (an independent hash slice with
    a smaller label shift) standing in for the challenger.

    Determinism: both classifiers are pure integer functions of the
    order key and status; the contingency counts are exact BIGINTs;
    the two statistics are fixed srnd6 expressions with b+c = 0
    guarded to NULL.

    Scale shape: ONE aggregate pass over the scan — the whole test
    is four conditional counts and two divisions. Nothing but a
    1-row frame ever shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    h1 = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h2 = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 9, 8), 16, 10
    ).cast("long")
    sc = o.select(
        y.alias("y"),
        F.when(h1 % 1000 + 300 * y >= 650, 1).otherwise(0).alias("a"),
        F.when(h2 % 1000 + 200 * y >= 650, 1).otherwise(0).alias("b"),
    )
    m = sc.agg(
        F.sum(
            F.when((F.col("a") == F.col("y")) & (F.col("b") != F.col("y")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("only_a"),
        F.sum(
            F.when((F.col("b") == F.col("y")) & (F.col("a") != F.col("y")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("only_b"),
        F.sum(
            F.when((F.col("a") == F.col("y")) & (F.col("b") == F.col("y")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("both_right"),
        F.sum(
            F.when((F.col("a") != F.col("y")) & (F.col("b") != F.col("y")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("both_wrong"),
    )
    d = (F.col("only_a") - F.col("only_b")).cast("double")
    tot = F.nullif((F.col("only_a") + F.col("only_b")).cast("double"), F.lit(0.0))
    return m.select(
        "only_a",
        "only_b",
        "both_right",
        "both_wrong",
        srnd(d * d / tot, 6).alias("chi2"),
        srnd((F.abs(d) - 1.0) * (F.abs(d) - 1.0) / tot, 6).alias("chi2_cc"),
    )
