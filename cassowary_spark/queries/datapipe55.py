"""Round-11 wave 58 (SURVEY.md §2): corpus diversity and retrieval
evaluation — distinct-n-gram diversity (C204), MRR / recall@k over
planted term queries (C205), file-layout clustering depth (C206),
the Theil inequality index (C207) and the Nelson-Aalen cumulative
hazard (C208).

C204/C205 complete the text-eval battery (C151 BLEU scores
generations, C152 nDCG scores rankings; C204 scores corpus diversity,
C205 scores retrieval itself). C206 is the lakehouse layout metric
the C33 Z-order step exists to improve. C207 is the curve-free
inequality scalar riding C202's cells frame. C208 is the hazard-scale
companion to C145's Kaplan-Meier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.operators.survival import reorder_durations
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ----------------------------------- C204 distinct-n-gram diversity


@query(
    "q_distinct_ngrams",
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    g1 AS (SELECT unnest(toks) AS g FROM t),
    g2 AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1])) AS g
        FROM t WHERE len(toks) >= 2
    ),
    g3 AS (
        SELECT unnest(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i + 1] || ' '
                           || toks[i + 2])) AS g
        FROM t WHERE len(toks) >= 3
    ),
    s1 AS (SELECT 1 AS n, CAST(count(*) AS BIGINT) AS total,
                  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct FROM g1),
    s2 AS (SELECT 2 AS n, CAST(count(*) AS BIGINT) AS total,
                  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct FROM g2),
    s3 AS (SELECT 3 AS n, CAST(count(*) AS BIGINT) AS total,
                  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct FROM g3),
    u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s3)
    SELECT CAST(n AS INT) AS n, total, n_distinct,
           {sql_srnd(
               "CAST(n_distinct AS DOUBLE)"
               " / nullif(CAST(total AS DOUBLE), 0.0)",
               6)} AS distinct_ratio
    FROM u
    """,
)
def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (C204): corpus-level distinct/total
    n-gram ratios for n = 1, 2, 3 — the generation-diversity metric
    (distinct-1/distinct-2 of the neural-generation literature)
    applied as a corpus health check: a mode-collapsed or
    template-heavy corpus shows a cratered distinct-2/3 ratio long
    before C15's within-doc repetition rule fires.

    Determinism: n-gram assembly is exact string concatenation over
    the same whitespace split in both engines; counts exact BIGINTs;
    one srnd6 ratio per row.

    Scale shape: each n is explode → count + count(DISTINCT) — the
    distinct compiles to partial-distinct per partition merged on an
    n-gram-keyed shuffle (the shuffle carries DISTINCT grams only,
    not occurrences). Three passes over the tokenized scan, each
    embarrassingly parallel; output is 3 rows. No sort, no window.
    """
    d = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("toks")
    )

    def grams(n: int):
        if n == 1:
            g = F.explode("toks")
        else:
            expr = F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.get(F.col("toks"), (i + F.lit(j)).cast("int"))
                        for j in range(n)
                    ],
                ),
            )
            g = F.explode(
                F.when(F.size("toks") >= n, expr).otherwise(
                    F.array().cast("array<string>")
                )
            )
        return (
            d.select(g.alias("g"))
            .agg(
                F.lit(n).cast("int").alias("n"),
                F.count("*").cast("long").alias("total"),
                F.countDistinct("g").cast("long").alias("n_distinct"),
            )
        )

    u = grams(1).unionAll(grams(2)).unionAll(grams(3))
    return u.select(
        "n",
        "total",
        "n_distinct",
        srnd(
            F.col("n_distinct").cast("double")
            / F.nullif(F.col("total").cast("double"), F.lit(0.0)),
            6,
        ).alias("distinct_ratio"),
    )


# ------------------------------- C205 retrieval MRR and recall@k

_MRR_TERMS = 5
_MRR_MAX_RANK = 100
_MRR_K = 10
_MRR_TITLE_TOKS = 8


@query(
    "q_retrieval_mrr",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    probes AS (
        SELECT term FROM (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ) ORDER BY df DESC, term LIMIT {_MRR_TERMS}
    ),
    titles AS (
        SELECT doc_id, list_slice(string_split(text, ' '), 1,
                                  {_MRR_TITLE_TOKS}) AS title
        FROM documents
    ),
    cand AS (
        SELECT tf.term, tf.doc_id, tf.tf,
               CASE WHEN list_contains(t.title, tf.term)
                    THEN 1 ELSE 0 END AS rel
        FROM tf JOIN probes p ON tf.term = p.term
        JOIN titles t ON t.doc_id = tf.doc_id
    ),
    ranked AS (
        SELECT term, doc_id, tf, rel,
               CAST(row_number() OVER (PARTITION BY term
                    ORDER BY tf DESC, doc_id) AS BIGINT) AS rnk
        FROM cand
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(rel) AS BIGINT) AS n_rel,
           CAST(coalesce(min(CASE WHEN rel = 1
                                  AND rnk <= {_MRR_MAX_RANK}
                             THEN rnk END), 0) AS BIGINT)
               AS first_rel_rank,
           {sql_srnd(
               "coalesce(1.0 / CAST(min(CASE WHEN rel = 1"
               f" AND rnk <= {_MRR_MAX_RANK}"
               " THEN rnk END) AS DOUBLE), 0.0)", 6)} AS rr,
           {sql_srnd(
               f"CAST(sum(CASE WHEN rel = 1 AND rnk <= {_MRR_K}"
               " THEN 1 ELSE 0 END) AS DOUBLE)"
               " / nullif(CAST(sum(rel) AS DOUBLE), 0.0)", 6)}
               AS recall_at_k
    FROM ranked GROUP BY term
    """,
)
def q_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval MRR / recall@k (C205): for the {t} highest-df probe
    terms, rank documents by term frequency and score the ranking
    against a deterministic relevance oracle (the term appears in
    the document's first {h} tokens — a "title match"): reciprocal
    rank of the first relevant hit (0 if none in the top {m}) and
    recall@{k}. The metric layer that closes the retrieval loop —
    C61 BM25 produces rankings, C152 nDCG grades graded relevance,
    MRR/recall grade the binary task a RAG pipeline actually runs.

    Determinism: probe selection orders (df DESC, term) — a strict
    total order; per-term ranking orders (tf DESC, doc_id) —
    positional but a pure deterministic order both engines replay;
    relevance is exact string membership; rr/recall are srnd6
    expressions over exact integers.

    Scale shape: tf is the C7 (doc, term)-keyed partial agg; the
    probe-term filter is a {t}-row broadcast semi-join applied
    BEFORE any ranking, so ranking windows run per probe term over
    that term's postings only (df-bounded, {t} parallel
    partitions — never a global frame); the rollup is {t} rows. At
    web scale the per-term window evolves to the B28 top-k
    (TakeOrdered per term caps postings at rank {m}); the fixture
    postings are already small.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    probes = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(_MRR_TERMS)
        .select("term")
    )
    titles = d.select(
        "doc_id",
        F.slice(F.split("text", " "), 1, _MRR_TITLE_TOKS).alias("title"),
    )
    cand = (
        tf.join(F.broadcast(probes), "term")
        .join(titles, "doc_id")
        .select(
            "term",
            "doc_id",
            "tf",
            F.when(
                F.array_contains(F.col("title"), F.col("term")), 1
            )
            .otherwise(0)
            .alias("rel"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    ranked = cand.withColumn("rnk", F.row_number().over(w).cast("long"))
    hit = F.when(
        (F.col("rel") == 1) & (F.col("rnk") <= _MRR_MAX_RANK), F.col("rnk")
    )
    return ranked.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("rel").cast("long").alias("n_rel"),
        F.coalesce(F.min(hit), F.lit(0)).cast("long").alias("first_rel_rank"),
        srnd(
            F.coalesce(1.0 / F.min(hit).cast("double"), F.lit(0.0)), 6
        ).alias("rr"),
        srnd(
            F.sum(
                F.when((F.col("rel") == 1) & (F.col("rnk") <= _MRR_K), 1)
                .otherwise(0)
            ).cast("double")
            / F.nullif(F.sum("rel").cast("double"), F.lit(0.0)),
            6,
        ).alias("recall_at_k"),
    )


q_retrieval_mrr.__doc__ = q_retrieval_mrr.__doc__.format(
    t=_MRR_TERMS, h=_MRR_TITLE_TOKS, m=_MRR_MAX_RANK, k=_MRR_K
)


# ----------------------------------- C206 layout clustering depth

_DEPTH_FILE_ROWS = 50
_DEPTH_PROBES = 16


@query(
    "q_clustering_depth",
    oracle=f"""
    WITH files AS (
        SELECT doc_id // {_DEPTH_FILE_ROWS} AS file_id,
               CAST(min(n_chars) AS BIGINT) AS mn,
               CAST(max(n_chars) AS BIGINT) AS mx
        FROM documents GROUP BY 1
    ),
    g AS (SELECT CAST(min(n_chars) AS BIGINT) AS gmin,
                 CAST(max(n_chars) AS BIGINT) AS gmax
          FROM documents),
    probes AS (
        SELECT CAST(i AS INT) AS probe_id,
               gmin + (i * (gmax - gmin)) // {_DEPTH_PROBES} AS probe_val
        FROM g, range(0, {_DEPTH_PROBES}) r(i)
    )
    SELECT p.probe_id, p.probe_val,
           CAST(sum(CASE WHEN p.probe_val BETWEEN f.mn AND f.mx
                    THEN 1 ELSE 0 END) AS BIGINT) AS depth
    FROM probes p CROSS JOIN files f
    GROUP BY 1, 2
    """,
)
def q_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-layout clustering depth (C206): treat every
    {r}-document ingestion batch as one data file, compute each
    file's n_chars zone map, and probe {p} evenly spaced points of
    the value domain for OVERLAP DEPTH — how many files' [min, max]
    ranges cover the point, i.e. how many files a point lookup must
    read after zone-map pruning (A30's skip list measures one
    filter; this measures the LAYOUT). Depth ≈ 1 everywhere means
    the layout is clustered on the column; ingestion-ordered layouts
    show depth ≈ file count — the before/after metric for C33's
    Z-order rewrite.

    Determinism: zone maps are exact BIGINT min/max; probe points
    are exact BIGINT interval arithmetic (integer division); depth
    is an exact containment count.

    Scale shape: one file-keyed partial agg collapses the corpus to
    its manifest-sized zone-map frame (A30's class); probes are {p}
    rows derived from a 1-row global reduce; the depth join is a
    broadcast nested-loop of {p} probes against the zone-map frame —
    bounded × manifest, never corpus-sized. No sort, no window.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    fid = (
        F.col("doc_id")
        - F.pmod(F.col("doc_id"), F.lit(_DEPTH_FILE_ROWS))
    ) / _DEPTH_FILE_ROWS
    files = d.groupBy(fid.cast("long").alias("file_id")).agg(
        F.min("n_chars").cast("long").alias("mn"),
        F.max("n_chars").cast("long").alias("mx"),
    )
    g = d.agg(
        F.min("n_chars").cast("long").alias("gmin"),
        F.max("n_chars").cast("long").alias("gmax"),
    )
    span = F.col("gmax") - F.col("gmin")
    num = F.col("i") * span
    probes = g.select(
        F.explode(F.sequence(F.lit(0), F.lit(_DEPTH_PROBES - 1))).alias("i"),
        "gmin",
        "gmax",
    ).select(
        F.col("i").cast("int").alias("probe_id"),
        (
            F.col("gmin")
            + (num - F.pmod(num, F.lit(_DEPTH_PROBES))) / _DEPTH_PROBES
        )
        .cast("long")
        .alias("probe_val"),
    )
    j = F.broadcast(probes).crossJoin(files)
    return j.groupBy("probe_id", "probe_val").agg(
        F.sum(
            F.when(
                F.col("probe_val").between(F.col("mn"), F.col("mx")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("depth")
    )


q_clustering_depth.__doc__ = q_clustering_depth.__doc__.format(
    r=_DEPTH_FILE_ROWS, p=_DEPTH_PROBES
)


# --------------------------------------- C207 Theil inequality index


@query(
    "q_theil_index",
    oracle=f"""
    WITH cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    cells AS (
        SELECT segment, rev, CAST(count(*) AS BIGINT) AS cnt
        FROM cust GROUP BY 1, 2
    ),
    tot AS (
        SELECT segment, cells.rev, cnt,
               CAST(sum(cnt) OVER (PARTITION BY segment) AS BIGINT) AS n,
               CAST(sum(rev * cnt) OVER (PARTITION BY segment)
                    AS BIGINT) AS s
        FROM cells
    ),
    terms AS (
        SELECT segment, rev, n, s,
               {sql_srnd(
                   "CAST(cnt AS DOUBLE)"
                   " * (CAST(rev AS DOUBLE)"
                   "    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))"
                   " * ln(CAST(rev AS DOUBLE)"
                   "      / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))",
                   8)} AS term
        FROM tot
    )
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n_customers,
           {sql_srnd("CAST(max(s) AS DOUBLE) / CAST(max(n) AS DOUBLE)",
                     4)} AS mean_cents,
           {sql_srnd(
               "list_sum(list(term ORDER BY rev)) / CAST(max(n) AS DOUBLE)",
               6)} AS theil
    FROM terms GROUP BY segment
    """,
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index (C207): per market segment,
    T = (1/N)·Σ (xᵢ/μ)·ln(xᵢ/μ) over customer revenue — the
    entropy-based inequality scalar that, unlike C101's Gini,
    DECOMPOSES exactly into within-group + between-group components
    (the property concentration audits across sources/segments
    need). T = 0 is perfect equality; ln(N) is maximal.

    Determinism: revenues are exact BIGINT cents; cells collapse
    equal revenues so each distinct value contributes ONE term
    cnt·(x/μ)ln(x/μ) — srnd8-quantized, then summed in FIXED
    revenue order via the C69 collect-sort-fold idiom, so the double
    reduction is bit-identical across engines and partitionings; μ
    is the same S/N division everywhere it appears.

    Scale shape: one (custkey, segment) partial agg (the join
    shuffles orders by custkey once), one groupBy to
    (segment, cents)-cells (domain-bounded), segment-partitioned
    windows over the cells frame for N and S, and a segment rollup
    whose fold runs over that bounded cells frame. No corpus sort,
    no single-partition corpus window.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey"),
        )
        .agg(F.sum(cents).cast("long").alias("rev"))
    )
    cells = cust.groupBy("segment", "rev").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wseg = Window.partitionBy("segment")
    tot = cells.select(
        "segment",
        "rev",
        "cnt",
        F.sum("cnt").over(wseg).cast("long").alias("n"),
        F.sum(F.col("rev") * F.col("cnt")).over(wseg).cast("long").alias("s"),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    x = F.col("rev").cast("double")
    terms = tot.select(
        "segment",
        "rev",
        "n",
        "s",
        srnd(F.col("cnt").cast("double") * (x / mu) * F.log(x / mu), 8).alias(
            "term"
        ),
    )
    agg = terms.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_customers"),
        srnd(
            F.max("s").cast("double") / F.max("n").cast("double"), 4
        ).alias("mean_cents"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(rev, term))),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"
        ).alias("__t"),
        F.max("n").alias("__n"),
    )
    return agg.select(
        "segment",
        "n_customers",
        "mean_cents",
        srnd(F.col("__t") / F.col("__n").cast("double"), 6).alias("theil"),
    )


# -------------------------------- C208 Nelson-Aalen cumulative hazard

_NA_MAX_T = 180


@query(
    "q_nelson_aalen",
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
    durs AS (
        SELECT CASE WHEN se.s IS NOT NULL
                    THEN date_diff('day', fi.f, se.s)
                    ELSE date_diff('day', fi.f, (SELECT c FROM censor))
               END AS dur,
               CASE WHEN se.s IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM firsts fi LEFT JOIN seconds se ON se.o_custkey = fi.o_custkey
    ),
    per AS (
        SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(ev) AS BIGINT) AS d
        FROM durs GROUP BY 1
    ),
    risk AS (
        SELECT dur, d,
               CAST(sum(n_all) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_risk
        FROM per
    ),
    ev_t AS (
        SELECT dur AS t, d, n_risk,
               CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                          * 100000000.0 + 0.5) AS BIGINT) AS hu,
               CAST(floor(CAST(d AS DOUBLE)
                          / (CAST(n_risk AS DOUBLE)
                             * CAST(n_risk AS DOUBLE))
                          * 100000000.0 + 0.5) AS BIGINT) AS vu
        FROM risk WHERE d > 0 AND dur <= {_NA_MAX_T}
    )
    SELECT t, n_risk, d,
           {sql_srnd(
               "CAST(sum(hu) OVER (ORDER BY t"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
               " AS DOUBLE) / 100000000.0",
               6)} AS h_hat,
           {sql_srnd(
               "sqrt(CAST(sum(vu) OVER (ORDER BY t"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
               " AS DOUBLE) / 100000000.0)",
               6)} AS se
    FROM ev_t
    """,
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard (C208): Ĥ(t) = Σ_{{tᵢ≤t}} dᵢ/nᵢ
    with its Poisson-variance standard error √(Σ dᵢ/nᵢ²), over the
    same reorder-survival frame as C145 — the hazard-scale view of
    the identical data: where Kaplan-Meier answers "what fraction
    survives to t", Nelson-Aalen's SLOPE reads the instantaneous
    reorder rate, the thing a retention intervention actually moves
    (and exp(−Ĥ) is the Fleming-Harrington survival estimate, more
    stable than KM in small risk sets).

    Determinism: durations are integer day diffs; at-risk counts are
    a reverse running sum over per-duration aggregates; each hazard
    and variance term quantizes to INTEGER 1e-8 units before its
    cumulative sum, so the accumulation is an exact BIGINT under any
    windowed-sum association (DuckDB's segment-tree vs Spark's
    sequential fold differ in ulps on a 180-term double cumsum —
    caught by the r11 sf0.1 parity sweep); the output quantizes
    srnd6 of the exact integer totals.

    Scale shape: identical to C145 — ONE custkey partial agg
    (operators/survival.py shared duration frame), then everything
    runs over the per-duration frame (bounded by the calendar span,
    the accepted class). No corpus-sized sort or window.
    """
    durs = reorder_durations(spark, sf_dir)
    per = durs.groupBy("dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum("ev").cast("long").alias("d"),
    )
    w_desc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per.select(
        "dur",
        "d",
        F.sum("n_all").over(w_desc).cast("long").alias("n_risk"),
    )
    dd = F.col("d").cast("double")
    nr = F.col("n_risk").cast("double")
    ev_t = risk.filter(
        (F.col("d") > 0) & (F.col("dur") <= _NA_MAX_T)
    ).select(
        F.col("dur").alias("t"),
        "n_risk",
        "d",
        F.floor(dd / nr * 1e8 + 0.5).cast("long").alias("hu"),
        F.floor(dd / (nr * nr) * 1e8 + 0.5).cast("long").alias("vu"),
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return ev_t.select(
        "t",
        "n_risk",
        "d",
        srnd(F.sum("hu").over(w_asc).cast("double") / 1e8, 6).alias(
            "h_hat"
        ),
        srnd(
            F.sqrt(F.sum("vu").over(w_asc).cast("double") / 1e8), 6
        ).alias("se"),
    )
