"""Round-11 wave 63 (SURVEY.md §2): estimation and planning
operators — decision-stump best split (C222), Chao1 vocabulary
richness with Good-Turing unseen mass (C223), capture-recapture
corpus-coverage estimation (C224), the Hurst R/S long-memory
exponent (C225) and Neyman sampling allocation (C226).

C222 is the first tree split every feature-screening pass computes;
C223/C224 answer "how much vocabulary / how many distinct documents
have we NOT seen yet" — the crawl-planning questions behind C21's
observed vocab and C1's observed dedup; C225 asks whether daily
traffic has long memory (which breaks the √n error bars everything
else quotes); C226 turns C8's stratified sample into the OPTIMAL one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# --------------------------------- C222 decision-stump best split


@query(
    "q_best_split",
    oracle=f"""
    WITH scored AS (
        SELECT (CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                    1, 8) AS BIGINT) % 1000
                + 300 * CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    cells AS (
        SELECT s, CAST(count(*) AS BIGINT) AS nk,
               CAST(sum(y) AS BIGINT) AS np
        FROM scored GROUP BY 1
    ),
    c AS (
        SELECT s,
               CAST(sum(nk) OVER (ORDER BY s) AS BIGINT) AS nl,
               CAST(sum(np) OVER (ORDER BY s) AS BIGINT) AS pl,
               CAST(sum(nk) OVER () AS BIGINT) AS n,
               CAST(sum(np) OVER () AS BIGINT) AS p
        FROM cells
    ),
    g AS (
        SELECT s, nl, n - nl AS nr,
               {sql_srnd(
                   "(2.0 * CAST(pl AS DOUBLE)"
                   " * CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE)"
                   " + 2.0 * CAST(p - pl AS DOUBLE)"
                   "   * CAST((n - nl) - (p - pl) AS DOUBLE)"
                   "   / CAST(n - nl AS DOUBLE))"
                   " / CAST(n AS DOUBLE)", 8)} AS gini,
               {sql_srnd(
                   "2.0 * CAST(p AS DOUBLE) * CAST(n - p AS DOUBLE)"
                   " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))",
                   6)} AS gini_root
        FROM c WHERE nl < n
    )
    SELECT CAST(s AS BIGINT) AS best_threshold,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           {sql_srnd("gini", 6)} AS gini_split, gini_root
    FROM g ORDER BY gini, s LIMIT 1
    """,
)
def q_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump best split (C222): the threshold on C99's
    score that minimizes weighted Gini impurity of the induced
    (left ≤ t, right > t) partition, vs the root impurity — the
    single most-used feature-screening primitive (a stump's impurity
    drop IS sklearn-style feature importance at depth 1, and the
    split point is the data-driven operating threshold C99 hardcodes
    at 650).

    Determinism: candidate thresholds are the distinct score cells;
    cumulative class counts are exact BIGINTs; each candidate's
    weighted Gini is one fixed srnd8 expression over exact integers
    (degenerate empty sides excluded by nl < n; nl ≥ 1 by
    construction since thresholds are observed values); the argmin
    orders (gini, s) — a strict total order after quantization.

    Scale shape: one score-keyed partial agg to ≤1300 cells (C99's
    bound), cumulative windows over THAT frame, TakeOrdered(1) for
    the argmin. No corpus sort; sp_corpus_windows = 0.
    """
    o = load_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    scored = o.select((h % 1000 + 300 * y).alias("s"), y.alias("y"))
    cells = scored.groupBy("s").agg(
        F.count("*").cast("long").alias("nk"),
        F.sum("y").cast("long").alias("np"),
    )
    wc = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    c = cells.select(
        "s",
        F.sum("nk").over(wc).cast("long").alias("nl"),
        F.sum("np").over(wc).cast("long").alias("pl"),
        F.sum("nk").over(wt).cast("long").alias("n"),
        F.sum("np").over(wt).cast("long").alias("p"),
    )
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    n, p = F.col("n").cast("double"), F.col("p").cast("double")
    nr, pr = n - nl, p - pl
    gini = srnd(
        (2.0 * pl * (nl - pl) / nl + 2.0 * pr * (nr - pr) / nr) / n, 8
    )
    gini_root = srnd(2.0 * p * (n - p) / (n * n), 6)
    g = c.filter(F.col("nl") < F.col("n")).select(
        "s",
        "nl",
        (F.col("n") - F.col("nl")).alias("nr"),
        gini.alias("gini"),
        gini_root.alias("gini_root"),
    )
    best = g.orderBy("gini", "s").limit(1)
    return best.select(
        F.col("s").cast("long").alias("best_threshold"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        srnd(F.col("gini"), 6).alias("gini_split"),
        "gini_root",
    )


# --------------------- C223 Chao1 vocabulary richness + Good-Turing


@query(
    "q_chao1_vocab",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS c
              FROM tok GROUP BY 1),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS d,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f1,
               CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f2,
               CAST(sum(c * (c - 1)) AS BIGINT) AS scc
        FROM vocab
    )
    SELECT d AS observed_vocab, n AS n_tokens, f1, f2,
           {sql_srnd(
               "CAST(d AS DOUBLE) + CAST(f1 AS DOUBLE)"
               " * (CAST(f1 AS DOUBLE) - 1.0)"
               " / (2.0 * (CAST(f2 AS DOUBLE) + 1.0))", 4)} AS chao1,
           {sql_srnd(
               "CAST(f1 AS DOUBLE) / CAST(n AS DOUBLE)", 6)}
               AS p_unseen,
           {sql_srnd(
               "1.0 - CAST(scc AS DOUBLE)"
               " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))",
               6)} AS simpson
    FROM s
    """,
)
def q_chao1_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness estimation (C223): the bias-corrected
    Chao1 estimate D + f₁(f₁−1)/(2(f₂+1)) of TOTAL vocabulary from
    the hapax/doubleton counts, the Good-Turing unseen probability
    mass f₁/N (the chance the next token is a new type), and the
    unbiased Simpson diversity 1 − Σc(c−1)/(N(N−1)) — the
    crawl-planning trio: C21 reports the vocabulary we HAVE, this
    estimates what we HAVEN'T crawled yet, which is the stopping
    rule for corpus expansion.

    Determinism: all five sufficient statistics (D, N, f₁, f₂,
    Σc(c−1)) are exact BIGINTs from the vocab counts frame; the
    three estimators are fixed srnd expressions (the +1 in Chao1's
    denominator makes f₂ = 0 well-defined — the bias-corrected
    form).

    Scale shape: one term-keyed partial-agg groupBy (THE vocab
    frame, C21's shape — the shuffle carries distinct terms), one
    1-row reduce over it. No windows, no sort, no joins.
    """
    d = load_table(spark, sf_dir, "documents").select("text")
    tok = d.select(F.explode(F.split("text", " ")).alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    s = vocab.agg(
        F.count("*").cast("long").alias("d"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("scc"),
    )
    dd = F.col("d").cast("double")
    nn = F.col("n").cast("double")
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    return s.select(
        F.col("d").alias("observed_vocab"),
        F.col("n").alias("n_tokens"),
        "f1",
        "f2",
        srnd(dd + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0)), 4).alias("chao1"),
        srnd(f1 / nn, 6).alias("p_unseen"),
        srnd(
            1.0 - F.col("scc").cast("double") / (nn * (nn - 1.0)), 6
        ).alias("simpson"),
    )


# ------------------------- C224 capture-recapture coverage estimate


@query(
    "q_capture_recapture",
    oracle=f"""
    WITH marked AS (
        SELECT md5(text) AS sig,
               max(CASE WHEN CAST('0x' || substr(md5(CAST(doc_id
                            AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                   THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN CAST('0x' || substr(md5(CAST(doc_id
                            AS VARCHAR)), 9, 8) AS BIGINT) % 2 = 0
                   THEN 1 ELSE 0 END) AS in_b
        FROM documents GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS d_true,
               CAST(sum(in_a) AS BIGINT) AS n_a,
               CAST(sum(in_b) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS m_both
        FROM marked
    )
    SELECT n_a, n_b, m_both, d_true,
           {sql_srnd(
               "(CAST(n_a AS DOUBLE) + 1.0)"
               " * (CAST(n_b AS DOUBLE) + 1.0)"
               " / (CAST(m_both AS DOUBLE) + 1.0) - 1.0", 4)}
               AS chapman_est
    FROM s
    """,
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture coverage (C224): estimate the number of
    DISTINCT documents in the underlying population from two
    independent hash-derived "crawls" (each distinct text is marked
    caught-by-A / caught-by-B via independent md5 slices of its doc
    ids) using the Chapman estimator (n_A+1)(n_B+1)/(m+1) − 1 —
    the ecology method that answers a crawl review's real question:
    "two overlapping crawls found 4.7M distinct pages; how many
    exist?" The true distinct count rides along so the fixture gate
    can score the estimator.

    Determinism: capture marks are exact max-of-indicator aggregates
    per distinct text signature; the four counts are exact BIGINTs;
    Chapman is one fixed srnd4 expression (the +1s make m = 0
    well-defined).

    Scale shape: one signature-keyed groupBy (C1's exact-dedup
    shuffle — carries md5 signatures, never text), one 1-row reduce.
    No windows, no joins.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 0
    ).cast("int")
    b = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10
        ).cast("long")
        % 2
        == 0
    ).cast("int")
    marked = d.groupBy(F.md5("text").alias("sig")).agg(
        F.max(a).alias("in_a"), F.max(b).alias("in_b")
    )
    s = marked.agg(
        F.count("*").cast("long").alias("d_true"),
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("m_both"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    m = F.col("m_both").cast("double")
    return s.select(
        "n_a",
        "n_b",
        "m_both",
        "d_true",
        srnd((na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0, 4).alias(
            "chapman_est"
        ),
    )


# ----------------------------- C225 Hurst exponent (rescaled range)

_HURST_SIZES = (7, 14, 28)


def _sql_rs(size: int) -> str:
    """Per-block ln(R/S) terms for one block size, from the indexed
    daily frame: work in n·x units so cumulative deviations stay
    exact integers (ncum_k = n·Σᵏx − k·S_blk; R·n = range(ncum),
    (S_std·n)² = n·Σx² − S² — so R/S = range(ncum)/√(n·Σx² − S²)).
    n·Σx² accumulates in HUGEINT (int64 overflowed at sf1, r11
    probe)."""
    return f"""
        SELECT {size} AS size, blk,
               {sql_srnd(
                   "ln((CAST(max(ncum) AS DOUBLE)"
                   "     - CAST(min(ncum) AS DOUBLE))"
                   "    / nullif(sqrt(CAST(max(nsxx)"
                   "        - CAST(max(sx) AS HUGEINT) * max(sx)"
                   "        AS DOUBLE)), 0.0))", 8)}
                   AS lrs
        FROM (
            SELECT (idx - 1) // {size} AS blk,
                   CAST({size} * sum(rev) OVER w
                        - row_number() OVER w
                          * sum(rev) OVER (PARTITION BY (idx - 1)
                                           // {size}) AS BIGINT) AS ncum,
                   CAST(sum(rev) OVER (PARTITION BY (idx - 1)
                                       // {size}) AS BIGINT) AS sx,
                   {size} * sum(CAST(rev AS HUGEINT) * rev)
                        OVER (PARTITION BY (idx - 1) // {size})
                        AS nsxx,
                   CAST(count(*) OVER (PARTITION BY (idx - 1)
                                       // {size}) AS BIGINT) AS nb
            FROM indexed
            WINDOW w AS (PARTITION BY (idx - 1) // {size} ORDER BY idx
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        WHERE nb = {size}
        GROUP BY blk
        HAVING max(nsxx) <> CAST(max(sx) AS HUGEINT) * max(sx)
           AND max(ncum) <> min(ncum)
    """


@query(
    "q_hurst_rs",
    oracle=f"""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    indexed AS (
        SELECT rev, CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                   AS idx
        FROM daily
    ),
    rs AS ({_sql_rs(7)} UNION ALL {_sql_rs(14)} UNION ALL {_sql_rs(28)})
    SELECT CAST(size AS INT) AS size,
           CAST(count(*) AS BIGINT) AS n_blocks,
           {sql_srnd("list_sum(list(lrs ORDER BY blk))"
                     " / CAST(count(*) AS DOUBLE)", 6)} AS mean_log_rs
    FROM rs GROUP BY size
    """,
)
def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst rescaled-range analysis (C225): per block size
    (7/14/28 days), the mean ln(R/S) of the daily revenue series —
    R the range of cumulative mean-deviations within the block, S
    the population std. The SLOPE of mean ln(R/S) against ln(size)
    is the Hurst exponent (≈0.5 memoryless; >0.5 long-memory /
    trending — which invalidates the iid √n error bars C130/C133
    quote); emitting the three points keeps the fit visible.

    Determinism: within-block cumulative deviations are computed in
    n·x units (ncum_k = n·Σᵏx − k·S_blk), so R·n = range(ncum) is an
    exact BIGINT and (S_std·n)² = n·Σx² − S² an exact wide integer
    (DECIMAL(38,0) / HUGEINT — int64 overflowed at sf1, r11 probe);
    each block's ln(R/S) = ln(range/√(n·Σx²−S²)) is one fixed srnd8
    expression; per-size means fold block terms in FIXED block order
    (C69); degenerate blocks (constant series) are excluded
    identically on both engines. Incomplete trailing blocks are
    dropped.

    Scale shape: calendar-bounded daily agg, one row_number window
    over it, per-size block windows over the SAME bounded frame
    (partitioned by block — parallel), per-size ≤ |days|/size-row
    folds. Everything after the first partial agg is calendar-sized.
    """
    o = load_table(spark, sf_dir, "orders")
    dollars = F.floor(F.col("o_totalprice") + 0.5).cast("long")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(dollars).cast("long").alias("rev"))
    indexed = daily.select(
        "rev",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("idx"),
    )
    parts = []
    for size in _HURST_SIZES:
        blk = ((F.col("idx") - 1) - F.pmod(F.col("idx") - 1, F.lit(size))) / size
        dec = "decimal(19,0)"
        base = indexed.select(
            "rev", "idx", blk.cast("long").alias("blk")
        )
        wcum = (
            Window.partitionBy("blk")
            .orderBy("idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wblk = Window.partitionBy("blk")
        rows = base.select(
            "blk",
            (
                size * F.sum("rev").over(wcum)
                - F.row_number().over(
                    Window.partitionBy("blk").orderBy("idx")
                )
                * F.sum("rev").over(wblk)
            )
            .cast("long")
            .alias("ncum"),
            F.sum("rev").over(wblk).cast("long").alias("sx"),
            (
                size
                * F.sum(F.col("rev").cast(dec) * F.col("rev").cast(dec)).over(
                    wblk
                )
            ).alias("nsxx"),
            F.count("*").over(wblk).cast("long").alias("nb"),
        ).filter(F.col("nb") == size)
        sx2 = F.col("__sx").cast(dec) * F.col("__sx").cast(dec)
        per_blk = (
            rows.groupBy("blk")
            .agg(
                F.max("ncum").alias("__mx"),
                F.min("ncum").alias("__mn"),
                F.max("nsxx").alias("__nsxx"),
                F.max("sx").alias("__sx"),
            )
            .filter(
                (F.col("__nsxx") != sx2)
                & (F.col("__mx") != F.col("__mn"))
            )
            .select(
                "blk",
                srnd(
                    F.log(
                        (
                            F.col("__mx").cast("double")
                            - F.col("__mn").cast("double")
                        )
                        / F.nullif(
                            F.sqrt(
                                (F.col("__nsxx") - sx2).cast("double")
                            ),
                            F.lit(0.0),
                        )
                    ),
                    8,
                ).alias("lrs"),
            )
        )
        parts.append(
            per_blk.agg(
                F.lit(size).cast("int").alias("size"),
                F.count("*").cast("long").alias("n_blocks"),
                (
                    F.expr(
                        "aggregate(array_sort(collect_list(struct(blk, lrs))),"
                        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.lrs)"
                    )
                    / F.count("*").cast("double")
                ).alias("__m"),
            ).select(
                "size",
                "n_blocks",
                srnd(F.col("__m"), 6).alias("mean_log_rs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------ C226 Neyman sample allocation

_NEYMAN_BUDGET = 1000


@query(
    "q_neyman_allocation",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sx,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY 1
    ),
    w AS (
        SELECT source, n_docs,
               {sql_srnd(
                   "sqrt(CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)"
                   "     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))",
                   8)} AS wh
        FROM s
    ),
    tw AS (
        SELECT {sql_srnd("list_sum(list(wh ORDER BY source))", 8)}
                   AS wtot
        FROM w
    )
    SELECT source, n_docs,
           {sql_srnd("wh / nullif((SELECT wtot FROM tw), 0.0)", 6)}
               AS alloc_share,
           CAST(floor(wh / nullif((SELECT wtot FROM tw), 0.0)
                      * {_NEYMAN_BUDGET} + 0.5) AS BIGINT) AS alloc_n
    FROM w
    """,
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman sampling allocation (C226): the variance-optimal
    per-stratum sample sizes n_h ∝ N_h·S_h for a {b}-document QA
    sample stratified by source — the upgrade over C8's proportional
    allocation that a review-budget planner actually wants: variable
    sources get MORE than their population share, uniform ones less,
    minimizing the variance of the corpus-wide estimate at fixed
    cost.

    Determinism: N_h·S_h = √(N_h·Σx² − (Σx)²) from exact BIGINT
    sufficient statistics, srnd8-quantized per stratum; the
    normalizer folds the quantized weights in FIXED source order
    (C69); shares srnd6, integer allocations floor(x·{b} + .5).

    Scale shape: one source-keyed partial agg to the |sources| frame
    (map-side combined); the normalizer is one fold over that frame
    (window over an aggregate — bounded); allocations are row-local.
    Overflow headroom: n_chars ≤ 10⁶ ⇒ Σx² ≤ 10¹²·N_h — safe to a
    million docs per source at BIGINT, beyond which x quantizes to
    10²-char units.
    """
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    s = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sxx"),
    )
    wh = srnd(
        F.sqrt(
            F.col("n_docs").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        ),
        8,
    )
    w = s.select("source", "n_docs", wh.alias("wh"))
    wtot = srnd(
        F.expr(
            "aggregate(array_sort(collect_list(struct(source, wh))),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.wh)"
        ),
        8,
    )
    tot = w.agg(wtot.alias("wtot"))
    t = w.crossJoin(F.broadcast(tot))
    share = F.col("wh") / F.nullif(F.col("wtot"), F.lit(0.0))
    return t.select(
        "source",
        "n_docs",
        srnd(share, 6).alias("alloc_share"),
        F.floor(share * _NEYMAN_BUDGET + 0.5).cast("long").alias("alloc_n"),
    )


q_neyman_allocation.__doc__ = q_neyman_allocation.__doc__.format(
    b=_NEYMAN_BUDGET
)