"""Round-9 wave 45 (SURVEY.md §2): cross-group quantile normalization
(C179) and jackknife variance for aggregate metrics (C180).

C179 is the feature-prep transform (expression-array/limma heritage)
that forces every group's metric distribution onto the corpus-wide
reference distribution; C180 is the cheapest replication-free
variance estimate for a corpus-level ratio — the third leg of the
uncertainty battery (C134 bootstrap resamples, C135 delta-method
linearizes, jackknife leaves strata out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------ C179 quantile normalization


@query(
    "q_quantile_normalize",
    oracle="""
    WITH m AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
        FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM m),
    cells AS (
        SELECT source, x, CAST(count(*) AS BIGINT) AS cnt
        FROM m GROUP BY 1, 2
    ),
    sc AS (
        SELECT source, x,
               CAST(2 * sum(cnt) OVER (PARTITION BY source ORDER BY x)
                    - cnt + 1 AS BIGINT) AS u2,
               CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS ng
        FROM cells
    ),
    tpos AS (
        SELECT source, x,
               CAST(1 + floor(
                   coalesce((CAST(u2 AS DOUBLE) - 2.0)
                            / nullif(2.0 * CAST(ng AS DOUBLE) - 2.0,
                                     0.0), 0.0)
                   * (CAST((SELECT nn FROM tot) AS DOUBLE) - 1.0)
                   + 0.5) AS BIGINT) AS t
        FROM sc
    ),
    g AS (
        SELECT x AS gx,
               CAST(sum(cnt2) OVER (ORDER BY x) AS BIGINT) AS hi,
               CAST(sum(cnt2) OVER (ORDER BY x) - cnt2 + 1
                    AS BIGINT) AS lo
        FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt2
              FROM m GROUP BY 1)
    )
    SELECT m.doc_id, m.source, m.x, CAST(g.gx AS BIGINT) AS x_norm
    FROM m
    JOIN tpos ON m.source = tpos.source AND m.x = tpos.x
    JOIN g ON tpos.t BETWEEN g.lo AND g.hi
    """,
)
def q_quantile_normalize(
    spark: SparkSession, sf_dir: str, *, approx: bool = False
) -> DataFrame:
    """Cross-group quantile normalization (C179): replace each
    document's length with the CORPUS-WIDE value at the same
    within-source quantile — after the transform every source has
    (a subsample of) the identical length distribution. The
    expression-array/limma normalization applied to corpus features:
    the preprocessing that makes per-source quality thresholds
    comparable when sources have wildly different length profiles
    (C44's length bands then cut identically everywhere).

    Mechanics (r11 re-authoring, tie-invariant): the within-source
    percentile is the AVERAGE-RANK of the doc's (source, x) cell —
    p = (ar − 1)/(n_g − 1) with 2·ar = u2 the exact doubled midrank
    (operators/ranks.doubled_midranks) — and the reference value is
    the global value whose cumulative-count interval [lo, hi]
    contains the target position t = 1 + ⌊p·(N−1) + 0.5⌋: the
    nearest-rank discrete quantile map with ties pooled on BOTH
    sides. A pure function of the two value multisets — no doc_id
    tiebreak anywhere. Singleton groups map to p = 0 (the explicit
    nullif/coalesce both engines spell).

    Determinism: midranks and cumulative intervals are exact BIGINTs;
    p and the index arithmetic are the same fixed IEEE expression on
    both engines; every t lands in exactly one [lo, hi] (the
    intervals tile 1..N); the output is an integer reference value —
    no float ever ships.

    Scale shape: two groupBys collapse the corpus to its (source, x)
    and global x cells — doc-length domains are bounded (≤ ~10⁶
    distinct) regardless of row count, so the per-source running-sum
    windows and the global cumulative window all run over
    domain-bounded frames (sp_corpus_windows = 0; no corpus sort
    exists in the plan). The quantile map is a range join of the
    cells frame against the BROADCAST global-cells intervals, then
    one (source, x) hash equi-join back to rows — the only
    corpus-sized shuffle. At truly unbounded domains the range join
    evolves to the union-and-forward-fill as-of form (B12's class);
    the fixtures never need it. ``approx=True`` keeps the
    sketch-reference variant (K-point approx-quantile vector, zero
    range join) for pipelines that cap reference resolution;
    tests/test_ranks.py pins the agreement.
    """
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("x")
    )
    if approx:
        k_ref = 1001
        ref = m.agg(
            F.percentile_approx(
                F.col("x").cast("double"),
                [i / (k_ref - 1) for i in range(k_ref)],
                10_000,
            ).alias("__ref")
        )
        cells = m.groupBy("source", "x").agg(
            F.count("*").cast("long").alias("cnt")
        )
        wcum = (
            Window.partitionBy("source")
            .orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wsrc_all = Window.partitionBy("source")
        # average rank of the cell's rows: ar = cum − (cnt−1)/2;
        # within-source percentile p = (ar − 1)/(ng − 1), singleton
        # sources pinned to p = 0 exactly as the exact form does
        ar = (
            F.sum("cnt").over(wcum).cast("double")
            - (F.col("cnt").cast("double") - 1.0) / 2.0
        )
        ng = F.sum("cnt").over(wsrc_all).cast("double")
        pc = cells.select(
            "source",
            "x",
            F.coalesce(
                (ar - 1.0) / F.nullif(ng - 1.0, F.lit(0.0)), F.lit(0.0)
            ).alias("p"),
        )
        # pc is (source, x)-distinct but doc lengths are NOT a small
        # quantized domain — no broadcast hint; the hash equi-join
        # co-partitions both sides (AQE may still broadcast when pc
        # measures small). Only the 1-row ref vector force-broadcasts.
        j = m.join(pc, ["source", "x"]).crossJoin(F.broadcast(ref))
        x_norm = F.get(
            F.col("__ref"),
            F.round(F.col("p") * (k_ref - 1)).cast("int"),
        )
        return j.select(
            "doc_id", "source", "x", x_norm.cast("long").alias("x_norm")
        )
    from cassowary_spark.operators.ranks import doubled_midranks

    tot = m.agg(F.count("*").cast("long").alias("nn"))
    cells = m.groupBy("source", "x").agg(
        F.count("*").cast("long").alias("cnt")
    )
    sc = doubled_midranks(
        cells, "x", "cnt", group_cols=["source"], out_col="u2"
    ).withColumn(
        "ng",
        F.sum("cnt").over(Window.partitionBy("source")).cast("long"),
    )
    p = F.coalesce(
        (F.col("u2").cast("double") - 2.0)
        / F.nullif(2.0 * F.col("ng").cast("double") - 2.0, F.lit(0.0)),
        F.lit(0.0),
    )
    tpos = sc.crossJoin(F.broadcast(tot)).select(
        "source",
        "x",
        (1 + F.floor(p * (F.col("nn").cast("double") - 1.0) + 0.5))
        .cast("long")
        .alias("t"),
    )
    gcells = m.groupBy("x").agg(F.count("*").cast("long").alias("cnt2"))
    gcum = (
        F.sum("cnt2")
        .over(
            Window.orderBy("x").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long")
    )
    g = gcells.select(
        F.col("x").alias("gx"),
        (gcum - F.col("cnt2") + 1).alias("lo"),
        gcum.alias("hi"),
    )
    mapped = tpos.join(
        F.broadcast(g),
        (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi")),
    ).select("source", "x", "gx")
    return m.join(mapped, ["source", "x"]).select(
        "doc_id", "source", "x", F.col("gx").cast("long").alias("x_norm")
    )


# ------------------------------------- C180 jackknife variance


@query(
    "q_jackknife_variance",
    oracle=f"""
    WITH e AS (
        SELECT event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    cells AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_i,
               CAST(sum(cents) AS BIGINT) AS s_i
        FROM e GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(s_i) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS g
        FROM cells
    ),
    loo AS (
        SELECT event_type,
               {sql_srnd(
                   "(CAST((SELECT s FROM tot) AS DOUBLE)"
                   " - CAST(s_i AS DOUBLE))"
                   " / (100.0 * (CAST((SELECT n FROM tot) AS DOUBLE)"
                   "             - CAST(n_i AS DOUBLE)))", 8)} AS theta_i
        FROM cells
    ),
    bar AS (
        SELECT {sql_srnd(
            "list_sum(list(theta_i ORDER BY event_type))"
            " / CAST((SELECT g FROM tot) AS DOUBLE)", 8)} AS theta_bar
        FROM loo
    ),
    dev AS (
        SELECT event_type,
               {sql_srnd(
                   "(theta_i - (SELECT theta_bar FROM bar))"
                   " * (theta_i - (SELECT theta_bar FROM bar))",
                   10)} AS d2
        FROM loo
    )
    SELECT (SELECT g FROM tot) AS g,
           {sql_srnd(
               "CAST((SELECT s FROM tot) AS DOUBLE)"
               " / (100.0 * CAST((SELECT n FROM tot) AS DOUBLE))",
               6)} AS theta,
           {sql_srnd(
               "sqrt((CAST((SELECT g FROM tot) AS DOUBLE) - 1.0)"
               " / CAST((SELECT g FROM tot) AS DOUBLE)"
               " * list_sum(list(d2 ORDER BY event_type)))", 6)} AS jack_se
    FROM dev LIMIT 1
    """,
)
def q_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife (C180): the standard error of the
    corpus mean event value from leave-one-stratum-out replicates —
    θ₍ᵢ₎ = (S − s_i)/(N − n_i) for each event_type stratum, and
    SE² = (g−1)/g · Σ (θ₍ᵢ₎ − θ̄)². The replication-free leg of the
    uncertainty battery (C134 bootstrap pays 200 hash-resamples,
    C135 delta-method needs a derivative; the grouped jackknife
    needs only the per-stratum totals a dashboard already computes),
    and the estimator survey pipelines use for design-based SEs.

    Determinism: per-stratum (n_i, s_i) are exact BIGINTs from one
    pass; every replicate is a fixed IEEE expression over exact
    integers via the leave-one-out identity (no second scan),
    srnd8'd; θ̄ and the deviance sum fold the ≤|types| quantized
    terms in type order (C69); squared deviations srnd10 before the
    final fold so both engines square identical doubles.

    Scale shape: one map-side-combining groupBy to |event_types|
    rows; ALL replicates derive from that frame by subtraction — the
    whole estimator is arithmetic on a broadcast-sized frame, the
    same shape at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    cells = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_i"),
            F.sum("cents").cast("long").alias("s_i"),
        )
    )
    # r14: totals, replicates, θ̄ and the deviance fold all run
    # row-locally over the packed |types|-row array in ONE 1-row
    # aggregate (was: persisted cell frame + 3 broadcast-join jobs).
    # The array sorts by event_type, so every fold keeps the old
    # type-order (C69) sequence; all intermediate quantizations
    # (srnd8 θ, srnd8 θ̄, srnd10 d²) are reproduced op-for-op.
    packed = cells.agg(
        F.expr(
            "array_sort(collect_list(struct(event_type, n_i, s_i)))"
        ).alias("cls")
    ).select(
        "cls",
        F.expr("aggregate(cls, 0L, (a, x) -> a + x.n_i)").alias("n"),
        F.expr("aggregate(cls, 0L, (a, x) -> a + x.s_i)").alias("s"),
        F.expr("CAST(size(cls) AS BIGINT)").alias("g"),
    )
    theta_i = (
        "floor(((CAST(s AS DOUBLE) - CAST(x.s_i AS DOUBLE))"
        " / (100.0 * (CAST(n AS DOUBLE) - CAST(x.n_i AS DOUBLE))))"
        " * 1.0E8 + 0.5) / 1.0E8"
    )
    th = packed.select(
        "n",
        "s",
        "g",
        F.expr(f"transform(cls, x -> {theta_i})").alias("thetas"),
    ).select(
        "n",
        "s",
        "g",
        "thetas",
        F.expr(
            "floor((aggregate(thetas, CAST(0.0 AS DOUBLE),"
            " (acc, t) -> acc + t) / CAST(g AS DOUBLE))"
            " * 1.0E8 + 0.5) / 1.0E8"
        ).alias("theta_bar"),
    )
    d2 = (
        "floor(((t - theta_bar) * (t - theta_bar))"
        " * 1.0E10 + 0.5) / 1.0E10"
    )
    return th.select(
        "g",
        srnd(
            F.col("s").cast("double") / (100.0 * F.col("n").cast("double")),
            6,
        ).alias("theta"),
        srnd(
            F.sqrt(
                (F.col("g").cast("double") - 1.0)
                / F.col("g").cast("double")
                * F.expr(
                    "aggregate(thetas, CAST(0.0 AS DOUBLE),"
                    f" (acc, t) -> acc + {d2})"
                )
            ),
            6,
        ).alias("jack_se"),
    )
