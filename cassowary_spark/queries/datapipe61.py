"""Round-11 wave 64 (SURVEY.md §2): layout and cohort finishers —
the file sortedness audit (A33), embedding effective dimension
(C227) and the two-group log-rank test (C228).

A33 is the cheap pre-check before C33's Z-order rewrite ("is the
layout already sorted enough to skip the job"); C227 collapses
C170's per-dimension variance profile to the one scalar a
model-ops dashboard tracks; C228 is the inferential layer over
C145/C208 — whether two cohorts' survival curves differ at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.operators.survival import reorder_durations
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# --------------------------------------- A33 file sortedness audit

_SORT_FILE_ROWS = 50


@query(
    "q_sortedness_audit",
    oracle=f"""
    WITH f AS (
        SELECT doc_id // {_SORT_FILE_ROWS} AS file_id, doc_id, n_chars
        FROM documents
    ),
    pairs AS (
        SELECT file_id,
               CASE WHEN n_chars >= lag(n_chars)
                        OVER (PARTITION BY file_id ORDER BY doc_id)
                    THEN 1 ELSE 0 END AS in_order,
               CASE WHEN lag(n_chars) OVER (PARTITION BY file_id
                                            ORDER BY doc_id) IS NULL
                    THEN 0 ELSE 1 END AS is_pair
        FROM f
    ),
    per AS (
        SELECT file_id,
               CAST(sum(is_pair) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN is_pair = 1 THEN in_order ELSE 0 END)
                    AS BIGINT) AS n_inorder
        FROM pairs GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
           CAST(sum(n_inorder) AS BIGINT) AS n_inorder,
           {sql_srnd(
               "CAST(sum(n_inorder) AS DOUBLE)"
               " / nullif(CAST(sum(n_pairs) AS DOUBLE), 0.0)",
               6)} AS sorted_fraction,
           CAST(sum(CASE WHEN n_inorder = n_pairs THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sorted_files
    FROM per
    """,
)
def q_sortedness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File sortedness audit (A33): treating every {r}-doc ingestion
    batch as a data file, the fraction of within-file adjacent pairs
    (in write order) whose n_chars is non-decreasing, plus the count
    of fully sorted files — the maintenance pre-check C33's Z-order
    rewrite wants ("already ~sorted → skip the rewrite; C206's depth
    will confirm the pruning quality either way"). sorted_fraction
    ≈ 0.5 is the random-layout baseline; 1.0 means the writer
    already clustered.

    Determinism: the pair indicator compares exact integers over the
    strict (file, doc_id) order; all counts exact BIGINTs; one srnd6
    division.

    Scale shape: the lag window partitions by file_id (manifest-
    cardinality partitions of {r} rows each — embarrassingly
    parallel, never global); the rollup collapses to the manifest
    frame then one row. No corpus sort.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    fid = (
        (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(_SORT_FILE_ROWS)))
        / _SORT_FILE_ROWS
    ).cast("long")
    w = Window.partitionBy("file_id").orderBy("doc_id")
    pairs = d.select(fid.alias("file_id"), "doc_id", "n_chars").select(
        "file_id",
        F.when(F.col("n_chars") >= F.lag("n_chars").over(w), 1)
        .otherwise(0)
        .alias("in_order"),
        F.when(F.lag("n_chars").over(w).isNull(), 0)
        .otherwise(1)
        .alias("is_pair"),
    )
    per = pairs.groupBy("file_id").agg(
        F.sum("is_pair").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("is_pair") == 1, F.col("in_order")).otherwise(0))
        .cast("long")
        .alias("n_inorder"),
    )
    return per.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("n_pairs").cast("long").alias("n_pairs"),
        F.sum("n_inorder").cast("long").alias("n_inorder"),
        srnd(
            F.sum("n_inorder").cast("double")
            / F.nullif(F.sum("n_pairs").cast("double"), F.lit(0.0)),
            6,
        ).alias("sorted_fraction"),
        F.sum(
            F.when(F.col("n_inorder") == F.col("n_pairs"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_sorted_files"),
    )


q_sortedness_audit.__doc__ = q_sortedness_audit.__doc__.format(
    r=_SORT_FILE_ROWS
)


# ------------------------------- C227 embedding effective dimension

_ED_Q = 1_000_000  # micro-units (C157/C170 idiom)


@query(
    "q_effective_dim",
    oracle=f"""
    WITH comp AS (
        SELECT i AS dim,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * {_ED_Q} + 0.5)
                    AS BIGINT) AS q
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)
    ),
    s AS (
        SELECT dim, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS sq,
               sum(CAST(q AS HUGEINT) * q) AS sqq
        FROM comp GROUP BY dim
    ),
    lam AS (
        SELECT dim,
               {sql_srnd(
                   f"CAST(CAST(n AS HUGEINT) * sqq"
                   f"     - CAST(sq AS HUGEINT) * sq AS DOUBLE)"
                   f" / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
                   f"    * {_ED_Q}.0 * {_ED_Q}.0)", 10)} AS v
        FROM s
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_dims,
               {sql_srnd("list_sum(list(v ORDER BY dim))", 10)} AS sv,
               {sql_srnd("list_sum(list(v * v ORDER BY dim))", 12)}
                   AS svv,
               {sql_srnd("max(v)", 10)} AS vmax
        FROM lam
    )
    SELECT n_dims,
           {sql_srnd("sv * sv / nullif(svv, 0.0)", 4)}
               AS effective_dim,
           {sql_srnd("vmax / nullif(sv, 0.0)", 6)} AS top_dim_share
    FROM agg
    """,
)
def q_effective_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding effective dimension (C227): the participation ratio
    (Σλ)²/Σλ² of the per-dimension variances — the one scalar that
    says how many of the 64 dimensions the embedding actually USES
    (64 = isotropic; ≪ 64 = collapsed/anisotropic, the condition
    that silently breaks cosine ANN recall), plus the top
    dimension's variance share. Collapses C170's per-dim profile to
    the dashboard number.

    Determinism: components quantize to micro-unit BIGINTs (C157);
    the per-dim population variance assembles exactly in wide
    integers (n·Σq² − (Σq)² in HUGEINT/DECIMAL — the r11 overflow
    discipline) with one double conversion, srnd10-quantized; Σλ and
    Σλ² fold in dimension order (C69) over the |dims| frame; the two
    ratios are guarded srnd expressions.

    Scale shape: posexplode to (dim, q) partial-aggs map-side to
    |dims| rows before the one shuffle (C170's column-profile
    reduction); everything after runs on ≤ |dims| rows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    dec = "decimal(19,0)"
    comp = e.select(
        F.posexplode("embedding").alias("dim0", "x")
    ).select(
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.floor(F.col("x").cast("double") * _ED_Q + 0.5)
        .cast("long")
        .alias("q"),
    )
    s = comp.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q").cast(dec) * F.col("q").cast(dec)).alias("sqq"),
    )
    nd = F.col("n").cast(dec)
    var = srnd(
        (nd * F.col("sqq") - F.col("sq").cast(dec) * F.col("sq").cast(dec))
        .cast("double")
        / (
            F.col("n").cast("double")
            * F.col("n").cast("double")
            * float(_ED_Q)
            * float(_ED_Q)
        ),
        10,
    )
    lam = s.select("dim", var.alias("v"))
    agg = lam.agg(
        F.count("*").cast("long").alias("n_dims"),
        srnd(
            F.expr(
                "aggregate(array_sort(collect_list(struct(dim, v))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v)"
            ),
            10,
        ).alias("sv"),
        srnd(
            F.expr(
                "aggregate(array_sort(collect_list(struct(dim, v))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v * x.v)"
            ),
            12,
        ).alias("svv"),
        srnd(F.max("v"), 10).alias("vmax"),
    )
    return agg.select(
        "n_dims",
        srnd(
            F.col("sv") * F.col("sv") / F.nullif(F.col("svv"), F.lit(0.0)),
            4,
        ).alias("effective_dim"),
        srnd(F.col("vmax") / F.nullif(F.col("sv"), F.lit(0.0)), 6).alias(
            "top_dim_share"
        ),
    )


# --------------------------------------- C228 two-group log-rank test


@query(
    "q_logrank",
    oracle=f"""
    WITH firsts AS (
        SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f
        FROM orders GROUP BY 1
    ),
    seconds AS (
        SELECT o.o_custkey, min(CAST(o.o_orderdate AS DATE)) AS s
        FROM orders o JOIN firsts fi ON o.o_custkey = fi.o_custkey
        WHERE CAST(o.o_orderdate AS DATE) > fi.f
        GROUP BY 1
    ),
    censor AS (SELECT max(CAST(o_orderdate AS DATE)) AS c FROM orders),
    grp AS (
        SELECT c_custkey,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
        FROM customer
    ),
    durs AS (
        SELECT g.g,
               CASE WHEN se.s IS NOT NULL
                    THEN date_diff('day', fi.f, se.s)
                    ELSE date_diff('day', fi.f, (SELECT c FROM censor))
               END AS dur,
               CASE WHEN se.s IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM firsts fi
        LEFT JOIN seconds se ON se.o_custkey = fi.o_custkey
        JOIN grp g ON g.c_custkey = fi.o_custkey
    ),
    per AS (
        SELECT dur,
               CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(ev) AS BIGINT) AS d,
               CAST(sum(g) AS BIGINT) AS n1_all,
               CAST(sum(g * ev) AS BIGINT) AS d1
        FROM durs GROUP BY 1
    ),
    risk AS (
        SELECT dur, d, d1,
               CAST(sum(n_all) OVER wd AS BIGINT) AS n_risk,
               CAST(sum(n1_all) OVER wd AS BIGINT) AS n1_risk
        FROM per
        WINDOW wd AS (ORDER BY dur DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    ev_t AS (
        SELECT dur, d, d1, n_risk, n1_risk,
               {sql_srnd(
                   "CAST(d AS DOUBLE) * CAST(n1_risk AS DOUBLE)"
                   " / CAST(n_risk AS DOUBLE)", 8)} AS eterm,
               {sql_srnd(
                   "CASE WHEN n_risk > 1 THEN"
                   " CAST(d AS DOUBLE)"
                   " * (CAST(n1_risk AS DOUBLE) / CAST(n_risk AS DOUBLE))"
                   " * (1.0 - CAST(n1_risk AS DOUBLE)"
                   "        / CAST(n_risk AS DOUBLE))"
                   " * (CAST(n_risk - d AS DOUBLE)"
                   "    / CAST(n_risk - 1 AS DOUBLE))"
                   " ELSE 0.0 END", 8)} AS vterm
        FROM risk WHERE d > 0
    ),
    tot AS (
        SELECT CAST(sum(d1) AS BIGINT) AS o1,
               {sql_srnd("list_sum(list(eterm ORDER BY dur))", 6)} AS e1,
               {sql_srnd("list_sum(list(vterm ORDER BY dur))", 6)} AS v
        FROM ev_t
    ),
    sizes AS (
        SELECT CAST(sum(g) AS BIGINT) AS n1,
               CAST(count(*) - sum(g) AS BIGINT) AS n2
        FROM durs
    )
    SELECT n1, n2, o1, e1,
           {sql_srnd(
               "(CAST(o1 AS DOUBLE) - e1) / nullif(sqrt(v), 0.0)",
               6)} AS z
    FROM tot CROSS JOIN sizes
    """,
)
def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test (C228): do BUILDING-segment customers
    reorder on a different clock than everyone else? O₁ − E₁ over
    the pooled event times with the hypergeometric variance — the
    standard survival-curve comparison, the inferential layer C145's
    Kaplan-Meier and C208's Nelson-Aalen describe but do not test
    (an A/B readout for time-to-event outcomes where C139's mean
    test is wrong under censoring).

    Determinism: the duration frame and both risk sets are exact
    BIGINTs from reverse running sums (one window serves pooled AND
    group-1 risk counts); each event time's E/V terms are fixed
    srnd8 expressions over exact integers, summed in FIXED duration
    order (C69 fold / ordered list_sum); O₁ is an exact BIGINT; z is
    one guarded srnd6 expression.

    Scale shape: C145's frame with the group flag riding along — ONE
    custkey partial agg (operators/survival.py), one groupBy to the
    calendar-bounded duration frame, windows and folds over THAT
    frame only (group sizes fold over the same cells). No corpus
    sort.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("g"),
    )
    durs = (
        reorder_durations(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .select("g", "dur", "ev")
    )
    per = durs.groupBy("dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum("ev").cast("long").alias("d"),
        F.sum("g").cast("long").alias("n1_all"),
        F.sum(F.col("g") * F.col("ev")).cast("long").alias("d1"),
    )
    wd = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per.select(
        "dur",
        "d",
        "d1",
        F.sum("n_all").over(wd).cast("long").alias("n_risk"),
        F.sum("n1_all").over(wd).cast("long").alias("n1_risk"),
    )
    dd = F.col("d").cast("double")
    nr = F.col("n_risk").cast("double")
    p1 = F.col("n1_risk").cast("double") / nr
    eterm = srnd(dd * p1, 8)
    vterm = srnd(
        F.when(
            F.col("n_risk") > 1,
            dd
            * p1
            * (1.0 - p1)
            * (
                (F.col("n_risk") - F.col("d")).cast("double")
                / (F.col("n_risk") - 1).cast("double")
            ),
        ).otherwise(F.lit(0.0)),
        8,
    )
    # r15: one aggregate over the UNFILTERED risk frame — the event
    # terms enter the sorted folds only where d > 0 (collect_list
    # skips the null structs, so the fold order and cells are exactly
    # the old filtered ev_t), d1 sums identically (d1 > 0 implies
    # d > 0), and the GROUP SIZES fall out of the same pass: the
    # reverse running sums peak at the smallest duration, so
    # max(n_risk) is the pooled N and max(n1_risk) is n1 — the
    # separate per-cells sizes aggregate and its broadcast join-back
    # are gone (the r14 budget loosening this wins back).
    ev_t = risk.select(
        "dur",
        "d",
        "d1",
        "n_risk",
        "n1_risk",
        eterm.alias("eterm"),
        vterm.alias("vterm"),
    )

    def fold(col: str):
        return F.expr(
            f"aggregate(array_sort(collect_list("
            f" CASE WHEN d > 0 THEN struct(dur, {col}) END)),"
            f" CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.{col})"
        )

    tot = ev_t.agg(
        F.sum("d1").cast("long").alias("o1"),
        srnd(fold("eterm"), 6).alias("e1"),
        srnd(fold("vterm"), 6).alias("v"),
        F.max("n1_risk").cast("long").alias("n1"),
        (F.max("n_risk") - F.max("n1_risk")).cast("long").alias("n2"),
    )
    return tot.select(
        "n1",
        "n2",
        "o1",
        "e1",
        srnd(
            (F.col("o1").cast("double") - F.col("e1"))
            / F.nullif(F.sqrt(F.col("v")), F.lit(0.0)),
            6,
        ).alias("z"),
    )
