"""Round-11 wave 62 (SURVEY.md §2): k-way comparisons and validity
checks — Cochran's Q over three classifiers (C218), propensity
overlap / positivity (C219), the Wald-Wolfowitz runs test (C220) and
a centroid silhouette for labeled embeddings (C221).

C218 extends C211's pair to the k-classifier leaderboard question;
C219 is the positivity precondition every C175/C191-style causal
adjustment silently assumes; C220 asks whether the daily series is
even exchangeable before C141's trend test gets to run; C221 closes
the clustering loop (C36 assigns, C59 scores affinity, silhouette
judges the partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------------- C218 Cochran's Q


@query(
    "q_cochran_q",
    oracle=f"""
    WITH m AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                   1, 8) AS BIGINT) % 1000 AS h1,
               CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                   9, 8) AS BIGINT) % 1000 AS h2,
               CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                   17, 8) AS BIGINT) % 1000 AS h3
        FROM orders
    ),
    c AS (
        SELECT CASE WHEN (CASE WHEN h1 + 300 * y >= 650 THEN 1 ELSE 0
                          END) = y THEN 1 ELSE 0 END AS ca,
               CASE WHEN (CASE WHEN h2 + 200 * y >= 650 THEN 1 ELSE 0
                          END) = y THEN 1 ELSE 0 END AS cb,
               CASE WHEN (CASE WHEN h3 + 250 * y >= 650 THEN 1 ELSE 0
                          END) = y THEN 1 ELSE 0 END AS cc
        FROM m
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(ca) AS BIGINT) AS g_a,
               CAST(sum(cb) AS BIGINT) AS g_b,
               CAST(sum(cc) AS BIGINT) AS g_c,
               CAST(sum((ca + cb + cc) * (ca + cb + cc)) AS BIGINT)
                   AS sr2
        FROM c
    )
    SELECT n, g_a, g_b, g_c,
           {sql_srnd(
               "2.0 * (3.0 * (CAST(g_a AS DOUBLE) * CAST(g_a AS DOUBLE)"
               "       + CAST(g_b AS DOUBLE) * CAST(g_b AS DOUBLE)"
               "       + CAST(g_c AS DOUBLE) * CAST(g_c AS DOUBLE))"
               "   - CAST(g_a + g_b + g_c AS DOUBLE)"
               "     * CAST(g_a + g_b + g_c AS DOUBLE))"
               " / nullif(3.0 * CAST(g_a + g_b + g_c AS DOUBLE)"
               "          - CAST(sr2 AS DOUBLE), 0.0)", 6)} AS q_stat
    FROM s
    """,
)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q (C218): are THREE classifier versions equally
    accurate on the same examples? Q = (k−1)·(k·ΣGⱼ² − (ΣGⱼ)²) /
    (k·ΣRᵢ − ΣRᵢ²) over the per-item correctness matrix — the
    k-classifier omnibus that must fire BEFORE pairwise C211
    McNemars (running three un-gated pairwise tests is the C193
    multiple-testing trap). Classifiers are three independent hash
    slices with different label shifts (300/200/250) — a planted
    quality ordering.

    Determinism: correctness indicators and all five sufficient
    statistics (N, three column totals, Σ row-total²) are exact
    BIGINTs from ONE aggregate; Q is a single guarded srnd6
    expression (denominator 0 ⇔ every item has all-same answers).

    Scale shape: one map-side-combining aggregate pass over the
    scan to a 1-row frame — nothing else exists in the plan.
    """
    o = load_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)

    def h(start: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.col("o_orderkey").cast("string")), start, 8
                ),
                16,
                10,
            ).cast("long")
            % 1000
        )

    def correct(hcol, shift: int):
        pred = F.when(hcol + shift * y >= 650, 1).otherwise(0)
        return F.when(pred == y, 1).otherwise(0)

    c = o.select(
        correct(h(1), 300).alias("ca"),
        correct(h(9), 200).alias("cb"),
        correct(h(17), 250).alias("cc"),
    )
    r = F.col("ca") + F.col("cb") + F.col("cc")
    s = c.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ca").cast("long").alias("g_a"),
        F.sum("cb").cast("long").alias("g_b"),
        F.sum("cc").cast("long").alias("g_c"),
        F.sum(r * r).cast("long").alias("sr2"),
    )
    ga, gb, gc = (
        F.col("g_a").cast("double"),
        F.col("g_b").cast("double"),
        F.col("g_c").cast("double"),
    )
    gtot = (F.col("g_a") + F.col("g_b") + F.col("g_c")).cast("double")
    q_stat = (
        2.0 * (3.0 * (ga * ga + gb * gb + gc * gc) - gtot * gtot)
    ) / F.nullif(3.0 * gtot - F.col("sr2").cast("double"), F.lit(0.0))
    return s.select(
        "n", "g_a", "g_b", "g_c", srnd(q_stat, 6).alias("q_stat")
    )


# ------------------------------- C219 propensity overlap / positivity

_OVL_CELLS = 100


@query(
    "q_propensity_overlap",
    oracle=f"""
    WITH m AS (
        SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id
                        AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 1
                    THEN 1 ELSE 0 END AS t,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                   9, 8) AS BIGINT) % {_OVL_CELLS}
                   AS cell
        FROM events
    ),
    cells AS (
        SELECT cell,
               CAST(sum(t) AS BIGINT) AS n_t,
               CAST(count(*) - sum(t) AS BIGINT) AS n_c
        FROM m GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_t) AS BIGINT) AS nt,
               CAST(sum(n_c) AS BIGINT) AS nc,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(CASE WHEN n_t = 0 OR n_c = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               CAST(sum(least(n_t * (SELECT CAST(sum(n_c) AS BIGINT)
                                     FROM cells),
                              n_c * (SELECT CAST(sum(n_t) AS BIGINT)
                                     FROM cells))) AS BIGINT) AS ovl_num
        FROM cells
    )
    SELECT nt, nc, n_cells, n_violations,
           {sql_srnd(
               "CAST(ovl_num AS DOUBLE)"
               " / (CAST(nt AS DOUBLE) * CAST(nc AS DOUBLE))", 6)}
               AS overlap
    FROM tot
    """,
)
def q_propensity_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity overlap / positivity check (C219): the overlap
    coefficient Σ min(p̂_t(cell), p̂_c(cell)) between the treated and
    control propensity-score distributions, plus the count of cells
    violating positivity (one arm empty) — the PRECONDITION audit
    for every C175/C191-style adjustment: matching and reweighting
    are only defined where both arms have support, and a low overlap
    means the causal question is being answered by extrapolation.
    Assignment hashes the USER (the unit of randomization), the
    score cell hashes the EVENT (the exposure's covariate profile) —
    independent slices, so this randomized design should show high
    overlap; the operator is the audit that would catch a targeted
    rollout.

    Determinism: per-cell arm counts are exact BIGINTs; the overlap
    sum uses the common-denominator identity
    Σ min(n_t·N_c, n_c·N_t) / (N_t·N_c) so the accumulation is an
    exact BIGINT min-sum — one srnd6 division at the end.

    Scale shape: one cell-keyed partial agg to {c} rows, a 1-row
    reduce over that frame. The headroom: n_t·N_c ≤ N² — BIGINT-safe
    to ~3e9 rows; beyond that the identity re-scales per-cell to
    srnd-quantized fractions.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    t = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
    )
    cell = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 9, 8), 16, 10
        ).cast("long")
        % _OVL_CELLS
    )
    m = ev.select(t.alias("t"), cell.alias("cell"))
    cells = m.groupBy("cell").agg(
        F.sum("t").cast("long").alias("n_t"),
        (F.count("*") - F.sum("t")).cast("long").alias("n_c"),
    )
    wt = Window.partitionBy()
    aug = cells.select(
        "n_t",
        "n_c",
        F.sum("n_t").over(wt).cast("long").alias("nt"),
        F.sum("n_c").over(wt).cast("long").alias("nc"),
    )
    tot = aug.agg(
        F.max("nt").cast("long").alias("nt"),
        F.max("nc").cast("long").alias("nc"),
        F.count("*").cast("long").alias("n_cells"),
        F.sum(
            F.when((F.col("n_t") == 0) | (F.col("n_c") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
        F.sum(
            F.least(
                F.col("n_t") * F.col("nc"), F.col("n_c") * F.col("nt")
            )
        )
        .cast("long")
        .alias("ovl_num"),
    )
    return tot.select(
        "nt",
        "nc",
        "n_cells",
        "n_violations",
        srnd(
            F.col("ovl_num").cast("double")
            / (F.col("nt").cast("double") * F.col("nc").cast("double")),
            6,
        ).alias("overlap"),
    )


# ------------------------------- C220 Wald-Wolfowitz runs test


@query(
    "q_runs_test",
    oracle=f"""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    cells AS (
        SELECT rev, CAST(count(*) AS BIGINT) AS cnt FROM daily GROUP BY 1
    ),
    med AS (
        SELECT CAST(min(CASE WHEN 2 * c >= n + 1 THEN rev END) AS BIGINT)
                   AS m
        FROM (SELECT rev,
                     CAST(sum(cnt) OVER (ORDER BY rev) AS BIGINT) AS c,
                     CAST(sum(cnt) OVER () AS BIGINT) AS n
              FROM cells)
    ),
    signs AS (
        SELECT day, CASE WHEN rev > (SELECT m FROM med) THEN 1 ELSE 0
                    END AS s
        FROM daily WHERE rev <> (SELECT m FROM med)
    ),
    runs AS (
        SELECT s,
               CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                         OR lag(s) OVER (ORDER BY day) <> s
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ),
    agg AS (
        SELECT CAST(sum(s) AS BIGINT) AS n1,
               CAST(count(*) - sum(s) AS BIGINT) AS n2,
               CAST(sum(new_run) AS BIGINT) AS r
        FROM runs
    )
    SELECT n1, n2, r,
           {sql_srnd(
               "(CAST(r AS DOUBLE)"
               " - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
               "    / CAST(n1 + n2 AS DOUBLE) + 1.0))"
               " / nullif(sqrt("
               "   2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
               "   * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
               "      - CAST(n1 + n2 AS DOUBLE))"
               "   / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)"
               "      * (CAST(n1 + n2 AS DOUBLE) - 1.0))), 0.0)",
               6)} AS z
    FROM agg
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test (C220): is the daily revenue series
    exchangeable around its median, or do above/below-median days
    CLUMP? Days equal to the median are excluded (the classic
    convention), runs of consecutive same-sign days are counted via
    a run-start indicator, and z compares the observed run count to
    its exchangeability moments — the randomness precondition C141's
    Mann-Kendall trend test and C104's CUSUM both implicitly assume.

    Determinism: daily revenues are exact integer dollars; the
    median is the counts-based nearest-rank over the revenue cells
    (tie-invariant — the C214 discipline); signs, run starts and
    counts are exact integers over the strict day order; z is one
    guarded srnd6 expression.

    Scale shape: the corpus collapses to the calendar-bounded daily
    agg; the median comes from a window over the revenue CELLS of
    that frame; the run scan is one lag window over ≤ |days| rows;
    the reduce is 1 row. Everything after the first partial agg is
    calendar-sized.
    """
    o = load_table(spark, sf_dir, "orders")
    dollars = F.floor(F.col("o_totalprice") + 0.5).cast("long")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(dollars).cast("long").alias("rev"))
    cells = daily.groupBy("rev").agg(F.count("*").cast("long").alias("cnt"))
    wc = Window.orderBy("rev").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy()
    med = (
        cells.select(
            "rev",
            F.sum("cnt").over(wc).cast("long").alias("c"),
            F.sum("cnt").over(wn).cast("long").alias("n"),
        )
        .agg(
            F.min(
                F.when(2 * F.col("c") >= F.col("n") + 1, F.col("rev"))
            )
            .cast("long")
            .alias("m")
        )
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("rev") != F.col("m"))
        .select(
            "day",
            F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("s"),
        )
    )
    wday = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(wday).isNull()
            | (F.lag("s").over(wday) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").cast("long").alias("n1"),
        (F.count("*") - F.sum("s")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("r"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1.0
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    return agg.select(
        "n1",
        "n2",
        "r",
        srnd(
            (F.col("r").cast("double") - mu)
            / F.nullif(F.sqrt(var), F.lit(0.0)),
            6,
        ).alias("z"),
    )


# ------------------------------- C221 centroid silhouette (labeled)

_SIL_UNIT = 1_000_000


@query(
    "q_silhouette",
    oracle=f"""
    WITH comp AS (
        SELECT vec_id, label, CAST(i AS INT) AS dim,
               CAST(floor(CAST(embedding[i] AS DOUBLE)
                          * {_SIL_UNIT} + 0.5) AS BIGINT) AS m
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)
    ),
    cent AS (
        SELECT label AS k, dim,
               CAST(floor(CAST(sum(m) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)
                   AS c
        FROM comp GROUP BY 1, 2
    ),
    d2 AS (
        SELECT comp.vec_id, comp.label, cent.k,
               CAST(sum((m - c) * (m - c)) AS BIGINT) AS dd
        FROM comp JOIN cent ON cent.dim = comp.dim
        GROUP BY 1, 2, 3
    ),
    ab AS (
        SELECT vec_id, label,
               max(CASE WHEN k = label THEN dd END) AS a2,
               min(CASE WHEN k <> label THEN dd END) AS b2
        FROM d2 GROUP BY 1, 2
    ),
    s AS (
        SELECT vec_id, label,
               CAST(floor(
                   (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
                   / nullif(greatest(sqrt(CAST(a2 AS DOUBLE)),
                                     sqrt(CAST(b2 AS DOUBLE))), 0.0)
                   * 1000000.0 + 0.5) AS BIGINT) AS sq
        FROM ab
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           {sql_srnd(
               "CAST(sum(sq) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
               " / 1000000.0", 6)} AS mean_silhouette
    FROM s GROUP BY label
    """,
)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid silhouette (C221): per label,
    mean of s(v) = (b−a)/max(a,b) with a = distance to the OWN label
    centroid and b = the nearest OTHER centroid — the simplified
    (centroid-based, O(n·k)) silhouette that judges whether the
    label partition is geometrically real, closing the clustering
    loop: C36 assigns, C59 scores affinity, C221 judges. Near 0 ⇒
    labels are not clusters in this embedding space; negative ⇒
    systematically mislabeled vectors.

    Determinism: components and centroids quantize to micro-unit
    BIGINTs (C157 idiom — the centroid mean is one floor(Σm/n + .5)
    rounding), so every squared distance is an exact BIGINT; each
    vector's s quantizes to 1e-6 BEFORE the per-label mean, making
    the final sum exact-integer in any order; one srnd6 division.

    Scale shape: posexplode to components; centroid frame is
    (k·dims) rows — broadcast; the distance join fans each component
    row out ×k and partial-aggs back to (vec, k) rows map-side; the
    a/b reduction is a vec-keyed agg, the report a k-row rollup. No
    windows, no sort; cost is O(n·k·d) map work with nothing
    corpus-sized shuffled twice.
    """
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.floor(F.col("x").cast("double") * _SIL_UNIT + 0.5)
        .cast("long")
        .alias("m"),
    )
    cent = comp.groupBy(F.col("label").alias("k"), "dim").agg(
        F.floor(
            F.sum("m").cast("double") / F.count("*").cast("double") + 0.5
        )
        .cast("long")
        .alias("c")
    )
    d2 = (
        comp.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "k")
        .agg(
            F.sum((F.col("m") - F.col("c")) * (F.col("m") - F.col("c")))
            .cast("long")
            .alias("dd")
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("k") == F.col("label"), F.col("dd"))).alias("a2"),
        F.min(F.when(F.col("k") != F.col("label"), F.col("dd"))).alias("b2"),
    )
    a = F.sqrt(F.col("a2").cast("double"))
    b = F.sqrt(F.col("b2").cast("double"))
    s = ab.select(
        "label",
        F.floor(
            (b - a) / F.nullif(F.greatest(a, b), F.lit(0.0)) * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("sq"),
    )
    return s.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        srnd(
            F.sum("sq").cast("double") / F.count("*").cast("double")
            / 1000000.0,
            6,
        ).alias("mean_silhouette"),
    )
