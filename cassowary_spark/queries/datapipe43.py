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
    gref AS (
        SELECT row_number() OVER (ORDER BY x, doc_id) AS gpos, x AS gx
        FROM m
    ),
    ranked AS (
        SELECT doc_id, source, x,
               row_number() OVER (PARTITION BY source
                                  ORDER BY x, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS ng
        FROM m
    ),
    idx AS (
        SELECT doc_id, source, x,
               CAST(1 + floor(
                   coalesce((CAST(r AS DOUBLE) - 1.0)
                            / nullif(CAST(ng AS DOUBLE) - 1.0, 0.0), 0.0)
                   * (CAST((SELECT nn FROM tot) AS DOUBLE) - 1.0)
                   + 0.5) AS BIGINT) AS gpos
        FROM ranked
    )
    SELECT i.doc_id, i.source, i.x, CAST(g.gx AS BIGINT) AS x_norm
    FROM idx i JOIN gref g USING (gpos)
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

    Mechanics: within-source position p = (rank−1)/(n_g−1) over the
    TOTAL order (x, doc_id); the reference value is the global
    (x, doc_id)-ordered sequence at index 1 + ⌊p·(N−1) + 0.5⌋ — the
    nearest-rank discrete quantile map, exact for equal group sizes
    and nearest-neighbor interpolated otherwise. Singleton groups
    map to p = 0 (the explicit nullif/coalesce both engines spell).

    Determinism: both rankings carry doc_id tiebreaks (identical
    sequences on both engines); p and the index arithmetic are the
    same fixed IEEE expression over exact integers; the output is
    an integer reference value — no float ever ships.

    Scale shape (exact): one source-partitioned rank window + one
    global rank (range-partitioned sort at 100 TB — B26's class);
    the final join is an integer-keyed equi-join of corpus-sized
    frames — hash-partition co-location, no broadcast of data.
    ``approx=True`` is the 100 TB production path: the global
    reference becomes a K-point approx-quantile vector (one sketch
    pass, 1-row broadcast), the within-source percentile becomes the
    average-rank p of each (source, x) CELL — computed by a running
    sum over the domain-bounded per-source distinct-value frame, the
    operators/ranks discipline — and the map is a (source, x)
    hash equi-join + row-local array index into the broadcast
    reference vector. No corpus sort or corpus window
    anywhere. Divergence from exact: tied (source, x) rows share one
    p (exact splits them by doc_id position) and the reference is
    sketch-resolution; tests/test_ranks.py pins the agreement. The
    exact form stays the default because exactness is the test
    contract.
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
    tot = m.agg(F.count("*").cast("long").alias("nn"))
    gref = m.select(
        F.row_number()
        .over(Window.orderBy("x", "doc_id"))
        .cast("long")
        .alias("gpos"),
        F.col("x").alias("gx"),
    )
    wsrc = Window.partitionBy("source").orderBy("x", "doc_id")
    ranked = m.select(
        "doc_id",
        "source",
        "x",
        F.row_number().over(wsrc).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ng"),
    )
    p = F.coalesce(
        (F.col("r").cast("double") - 1.0)
        / F.nullif(F.col("ng").cast("double") - 1.0, F.lit(0.0)),
        F.lit(0.0),
    )
    idx = ranked.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "source",
        "x",
        (
            1
            + F.floor(p * (F.col("nn").cast("double") - 1.0) + 0.5)
        )
        .cast("long")
        .alias("gpos"),
    )
    return idx.join(gref, "gpos").select(
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
        .persist()  # |types| rows; totals and replicates reuse it
    )
    tot = cells.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("s_i").cast("long").alias("s"),
        F.count("*").cast("long").alias("g"),
    )
    loo = cells.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        "s",
        "g",
        srnd(
            (F.col("s").cast("double") - F.col("s_i").cast("double"))
            / (
                100.0
                * (F.col("n").cast("double") - F.col("n_i").cast("double"))
            ),
            8,
        ).alias("theta_i"),
    )
    bar = loo.agg(
        srnd(
            F.expr(
                "aggregate(array_sort(collect_list(struct(event_type,"
                " theta_i))), CAST(0.0 AS DOUBLE),"
                " (acc, x) -> acc + x.theta_i)"
            )
            / F.max("g").cast("double"),
            8,
        ).alias("theta_bar")
    )
    dev = loo.crossJoin(F.broadcast(bar)).select(
        "event_type",
        "n",
        "s",
        "g",
        srnd(
            (F.col("theta_i") - F.col("theta_bar"))
            * (F.col("theta_i") - F.col("theta_bar")),
            10,
        ).alias("d2"),
    )
    return dev.agg(
        F.max("g").alias("g"),
        srnd(
            F.max("s").cast("double") / (100.0 * F.max("n").cast("double")),
            6,
        ).alias("theta"),
        srnd(
            F.sqrt(
                (F.max("g").cast("double") - 1.0)
                / F.max("g").cast("double")
                * F.expr(
                    "aggregate(array_sort(collect_list(struct(event_type,"
                    " d2))), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.d2)"
                )
            ),
            6,
        ).alias("jack_se"),
    )
