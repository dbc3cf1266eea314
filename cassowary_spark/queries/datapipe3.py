"""Training-data pipeline operators, round 5 third wave (SURVEY.md §2
C43-C51 + B42).

Binary (sign-bit) embedding quantization with Hamming-distance top-k;
temperature-scaled source mixing (weight ∝ mass^alpha); gap/delta
encoding of inverted-index postings; product-quantization encoding
(the PQ half of an IVFPQ index, completing C22/C36's IVF half); the
WITH RECURSIVE SQL surface (Spark 4 recursive CTEs); bigram-LM
conditional log-prob scoring; cross-corpus n-gram novelty; corpus
mean-centering with L2 renorm; per-source token-budget trimming; and
three-round greedy BPE merge training.

Same determinism discipline as datapipe.py/datapipe2.py: integer
arithmetic wherever a comparison or row-set membership depends on it,
``srnd`` on float outputs, float reductions only in fixed positional
order so both engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------------------- C43 binary-quantized ANN

_HAM_K = 10


@query(
    "q_ann_hamming",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           CAST(len(list_filter(range(1, len(e.embedding) + 1),
                i -> (e.embedding[i] > 0) <> (q.qv[i] > 0))) AS BIGINT)
               AS hamming
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY hamming, e.vec_id LIMIT {_HAM_K}
    """,
)
def q_ann_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (C43): each 64-dim float vector becomes
    64 sign bits packed into two 32-bit words; candidate retrieval is
    Hamming distance = popcount(xor) — the 1-bit-per-dim compressed
    search modern vector stores run before exact re-ranking (cosine of
    mean-centered vectors correlates with sign agreement).

    Scale shape: packing is a row-local fixed-order integer fold (one
    pass, JVM HOFs, zero float ops after the sign test), so the index
    side stores 8 bytes/vector instead of 256 — at 100 TB the packed
    column is what gets scanned, the float column stays untouched
    until re-rank. The query row broadcasts (1 row); scoring is
    bit_count(xor) whole-stage-codegen'd; top-k is TakeOrdered
    (per-partition heaps, ties broken by vec_id). No shuffle at all —
    the only movement is k rows to the driver-side limit.

    Determinism: sign tests and xor/popcount are exact integer ops;
    the oracle computes the same Hamming distance positionally, so
    both engines agree bit-for-bit.
    """
    e = load_table(spark, sf_dir, "embeddings")
    half = (
        "aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT),"
        " (acc, i) -> acc * 2 + IF(element_at(embedding, i) > 0,"
        " CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"
    )
    packed = e.select(
        "vec_id",
        F.expr(half.format(lo=1, hi=32)).alias("b_hi"),
        F.expr(half.format(lo=33, hi=64)).alias("b_lo"),
    )
    qrow = packed.filter(F.col("vec_id") == 0).select(
        F.col("b_hi").alias("q_hi"), F.col("b_lo").alias("q_lo")
    )
    scored = (
        packed.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            F.expr(
                "CAST(bit_count(b_hi ^ q_hi) + bit_count(b_lo ^ q_lo) AS BIGINT)"
            ).alias("hamming"),
        )
    )
    return scored.orderBy("hamming", "vec_id").limit(_HAM_K)


# ------------------------------------------------- C44 temperature-scaled mix

_MIX_ALPHA = 0.7
_MIX_BUDGET = 1_000_000  # token budget the weights allocate


@query(
    "q_temperature_mix",
    oracle=f"""
    WITH m AS (
        SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens
        FROM documents GROUP BY lang
    ),
    t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM m),
    w AS (
        SELECT lang, n_tokens,
               pow(CAST(n_tokens AS DOUBLE) / t.total, {_MIX_ALPHA}) AS pw
        FROM m, t
    ),
    z AS (SELECT sum(pw) AS zn FROM w)
    SELECT lang, n_tokens,
           CAST(floor(w.pw / z.zn * {_MIX_BUDGET}.0 + 0.5) AS BIGINT)
               AS alloc_tokens,
           CAST(floor(w.pw / z.zn * {_MIX_BUDGET}.0 + 0.5) AS DOUBLE)
               / {_MIX_BUDGET}.0 AS weight
    FROM w, z
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing (C44): per-language sampling
    weights ∝ (token share)^alpha, alpha=0.7 — the multilingual-LM
    rebalancing rule (XLM-R style) that up-weights low-resource
    strata without letting any stratum dominate. Output: each
    language's exact token mass, its allocation out of a 1M-token
    budget, and the normalized weight.

    Scale shape: one lang-keyed groupBy with map-side partial sums
    (token counting is a row-local ``size(split())``); the total and
    the normalizer are 1-row aggregates broadcast back via crossJoin —
    the corpus never shuffles twice and nothing collects to the
    driver. Output cardinality = #languages.

    Determinism: the only float ops are pow/divide on integer-exact
    masses; the allocation is floor-rounded half-up so both engines
    derive the integer (and the weight FROM that integer) from doubles
    equal to ~1 ulp.
    """
    d = load_table(spark, sf_dir, "documents")
    m = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    total = m.agg(F.sum("n_tokens").cast("double").alias("total"))
    w = m.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_tokens",
        F.pow(F.col("n_tokens") / F.col("total"), F.lit(_MIX_ALPHA)).alias("pw"),
    )
    z = w.agg(F.sum("pw").alias("zn"))
    out = w.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_tokens",
        F.floor(F.col("pw") / F.col("zn") * F.lit(float(_MIX_BUDGET)) + F.lit(0.5))
        .cast("long")
        .alias("alloc_tokens"),
    )
    return out.withColumn(
        "weight", F.col("alloc_tokens").cast("double") / F.lit(float(_MIX_BUDGET))
    )


# ------------------------------------------------- C45 postings delta encode

_POST_MIN_DF = 10


@query(
    "q_postings_delta",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    p AS (
        SELECT term, list_sort(list(doc_id)) AS postings
        FROM tok GROUP BY term
    )
    SELECT term,
           CAST(len(postings) AS BIGINT) AS df,
           array_to_string(list_transform(range(1, len(postings) + 1),
               i -> CAST(CASE WHEN i = 1 THEN postings[1]
                         ELSE postings[i] - postings[i - 1] END AS VARCHAR)),
               ',') AS deltas
    FROM p WHERE len(postings) >= {_POST_MIN_DF}
    """,
)
def q_postings_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-encoded postings (C45): the inverted index's posting lists
    (C26) re-expressed as first-id + successive gaps — the layout
    every retrieval engine applies before varint/PForDelta compression,
    because sorted doc-id gaps are small and compress ~10x better than
    raw 64-bit ids.

    Scale shape: term-doc pairs dedup map-side (explode + distinct
    share the term shuffle's lineage); ONE shuffle keyed by term;
    the delta transform is a row-local fixed-order integer HOF over
    the already-sorted array — no window, no self-join, exact int64
    arithmetic end-to-end. Shuffle size is vocabulary x df, i.e. the
    index size, not the corpus size.

    Output encoding: deltas ship as a comma-joined string of int64
    gaps, not an ARRAY — the driver's canonicalizer cannot order list
    cells (r7 adjudication error); atomic output columns are enforced
    by ``oracle.compare``. Gap order is positional, deterministic on
    both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    p = tok.groupBy("term").agg(
        F.sort_array(F.collect_set("doc_id")).alias("postings")
    )
    return (
        p.filter(F.size("postings") >= _POST_MIN_DF)
        .select(
            "term",
            F.size("postings").cast("long").alias("df"),
            F.expr(
                "array_join(transform(postings, (x, i) ->"
                " CAST(IF(i = 0, x, x - element_at(postings, i)) AS STRING)),"
                " ',')"
            ).alias("deltas"),
        )
    )


# ------------------------------------------------- C46 product quantization

_PQ_SUBSPACES = 4
_PQ_SUBDIM = 16  # 64-dim vectors -> 4 x 16


@query(
    "q_pq_encode",
    oracle=f"""
    WITH sub AS (
        SELECT vec_id, label, s AS subspace,
               list_transform(
                   list_slice(embedding, s * {_PQ_SUBDIM} + 1,
                              s * {_PQ_SUBDIM} + {_PQ_SUBDIM}),
                   x -> CAST(x AS DOUBLE)) AS sv
        FROM embeddings, UNNEST(range(0, {_PQ_SUBSPACES})) t(s)
    ),
    comp AS (
        SELECT label, subspace, i AS pos,
               {sql_srnd("avg(sv[i])", 4)} AS cv
        FROM sub, UNNEST(range(1, {_PQ_SUBDIM} + 1)) u(i)
        GROUP BY label, subspace, i
    ),
    cent AS (
        SELECT label AS c_label, subspace, list(cv ORDER BY pos) AS c
        FROM comp GROUP BY label, subspace
    ),
    dist AS (
        SELECT v.vec_id, v.subspace, c.c_label,
               list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1),
                   i -> (v.sv[i] - c.c[i]) * (v.sv[i] - c.c[i]))) AS d2
        FROM sub v JOIN cent c ON c.subspace = v.subspace
    ),
    r AS (
        SELECT vec_id, subspace, c_label, d2,
               row_number() OVER (
                   PARTITION BY vec_id, subspace ORDER BY d2, c_label
               ) AS rn
        FROM dist
    )
    SELECT vec_id, CAST(subspace AS BIGINT) AS subspace,
           c_label AS code, {sql_srnd("d2", 6)} AS d2
    FROM r WHERE rn = 1
    """,
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (C46): split each 64-dim vector
    into 4 sub-vectors of 16 dims, build a per-subspace codebook (the
    per-label sub-centroids — C22's M-step run per subspace), and
    assign every sub-vector its nearest code. vec -> 4 small codes is
    the PQ compression inside an IVFPQ index: with C3''/C36's IVF
    routing this completes the classic FAISS-style scale path where
    the corpus stores 4 bytes/vector and exact floats are only
    fetched for the final re-rank.

    Scale shape: codebook = one (label, subspace, pos)-keyed shuffle
    whose output is labels x subspaces x subdim — corpus-independent —
    then collapses to K x subspaces rows of arrays and BROADCASTS.
    Encoding is a map-local subspace-equi broadcast join + fixed-order
    positional distance fold + one (vec_id, subspace) partial-agg
    ``min(struct)``. The corpus shuffles once (the argmin groupBy,
    combining map-side); output is 4 rows per vector.

    Determinism: centroid components srnd-quantized BEFORE distances
    (the avg's reduction order is the one engine-varying float op);
    the distance fold is positional so identical inputs give
    bit-identical doubles; argmin ties break on code label.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    subs = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_PQ_SUBSPACES - 1}),"
                f" s -> transform(slice(embedding, s * {_PQ_SUBDIM} + 1,"
                f" {_PQ_SUBDIM}), x -> CAST(x AS DOUBLE)))"
            )
        ).alias("subspace", "sv"),
    )
    comp = (
        subs.select("label", "subspace", F.posexplode("sv").alias("pos", "val"))
        .groupBy("label", "subspace", "pos")
        .agg(srnd(F.avg("val"), 4).alias("cv"))
    )
    cent = (
        comp.groupBy("label", "subspace")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("__s"))
        .select(
            F.col("label").alias("c_label"),
            F.col("subspace").alias("c_subspace"),
            F.expr("transform(__s, x -> x.cv)").alias("c"),
        )
    )
    dist = subs.join(
        F.broadcast(cent), subs["subspace"] == cent["c_subspace"]
    ).select(
        "vec_id",
        "subspace",
        "c_label",
        F.expr(
            "aggregate(zip_with(sv, c, (a, b) -> (a - b) * (a - b)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("d2"),
    )
    m = dist.groupBy("vec_id", "subspace").agg(
        F.min(F.struct("d2", "c_label")).alias("__m")
    )
    return m.select(
        "vec_id",
        F.col("subspace").cast("long").alias("subspace"),
        F.col("__m.c_label").alias("code"),
        srnd(F.col("__m.d2"), 6).alias("d2"),
    )


# ------------------------------------------------- B42 recursive CTE surface

_SPINE_START = "2024-01-01"
_SPINE_END = "2024-02-04"  # past the data's last day: exercises zero-rows days


@query(
    "q_recursive_cte",
    oracle=f"""
    WITH RECURSIVE days(day) AS (
        SELECT DATE '{_SPINE_START}'
        UNION ALL
        SELECT day + 1 FROM days
        WHERE day < DATE '{_SPINE_END}'
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           count(e.event_id) AS n_events,
           CAST(coalesce(sum(CASE WHEN e.event_type = 'error'
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_errors
    FROM days d LEFT JOIN events e ON CAST(e.ts AS DATE) = d.day
    GROUP BY d.day
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE surface (B42): a WITH RECURSIVE date spine (Spark
    4's recursive CTE support) left-joined to the events fact — the
    canonical "report every day, including empty ones" shape, with the
    spine extending past the data so zero-count days are exercised.

    Scale shape: the recursion materializes 35 driver-side-free rows
    (each step is a plan union, bounded by
    spark.sql.cteRecursionLevelLimit); the spine side is tiny so AQE
    broadcasts it and the fact table never shuffles for the join; the
    per-day rollup is one date-keyed partial agg. The same recursion
    machinery covers hierarchy walks (org charts, BOM explosions)
    where iteration count = graph depth, not size.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        f"""
        WITH RECURSIVE days(day) AS (
            SELECT DATE '{_SPINE_START}'
            UNION ALL
            SELECT date_add(day, 1) FROM days WHERE day < DATE '{_SPINE_END}'
        )
        SELECT date_format(d.day, 'yyyy-MM-dd') AS day,
               count(e.event_id) AS n_events,
               CAST(coalesce(sum(CASE WHEN e.event_type = 'error'
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_errors
        FROM days d LEFT JOIN events e ON CAST(e.ts AS DATE) = d.day
        GROUP BY d.day
        """
    )


# ------------------------------------------------- C47 bigram-LM scoring


@query(
    "q_bigram_logprob",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tok AS (
        SELECT doc_id, i AS pos, t[i] AS w
        FROM tk, UNNEST(range(1, len(t) + 1)) u(i)
    ),
    big AS (
        SELECT doc_id, pos, w AS w1,
               lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok
    ),
    bigf AS (SELECT * FROM big WHERE w2 IS NOT NULL),
    c2 AS (SELECT w1, w2, count(*) AS cnt2 FROM bigf GROUP BY w1, w2),
    c1 AS (SELECT w, count(*) AS cnt1 FROM tok GROUP BY w),
    v AS (SELECT count(DISTINCT w) AS vs FROM tok),
    terms AS (
        SELECT b.doc_id, b.pos,
               {sql_srnd("ln((c2.cnt2 + 1.0) / (c1.cnt1 + v.vs))", 8)} AS lp
        FROM bigf b
        JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
        JOIN c1 ON c1.w = b.w1
        CROSS JOIN v
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           {sql_srnd("list_sum(list(lp ORDER BY pos)) / count(*)", 4)}
               AS lp_mean
    FROM terms GROUP BY doc_id
    """,
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score (C47): mean Laplace-smoothed conditional
    log-probability ln((c(w1,w2)+1)/(c(w1)+V)) of each document's
    adjacent token pairs under the corpus's own bigram model — the
    second-order upgrade of C29's unigram filter (catches shuffled-
    word salads that unigram mass can't).

    Scale shape: one doc-keyed window builds bigrams (lead over token
    position); bigram and unigram counts are term-keyed partial-agg
    groupBys; the count joins are vocabulary-sized (broadcast here;
    term-keyed shuffle joins at scale) and V rides a 1-row crossJoin.
    The per-doc mean folds the per-bigram terms in FIXED position
    order (collect_list → array_sort → aggregate), each term itself
    srnd-quantized, so the double sum is bit-identical across engines
    and partitionings — never an unordered float reduction.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("w2", F.lead("w").over(wdoc))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "pos", F.col("w").alias("w1"), "w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("cnt2"))
    c1 = tok.groupBy("w").agg(F.count("*").alias("cnt1"))
    v = tok.select(F.countDistinct("w").alias("vs"))
    terms = (
        big.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), big["w1"] == c1["w"])
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "pos",
            srnd(
                F.log((F.col("cnt2") + F.lit(1.0)) / (F.col("cnt1") + F.col("vs"))),
                8,
            ).alias("lp"),
        )
    )
    agg = terms.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(pos, lp))),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.lp)"
        ).alias("__s"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        srnd(F.col("__s") / F.col("n_bigrams"), 4).alias("lp_mean"),
    )


# ------------------------------------------------- C48 cross-corpus novelty

_NOV_K = 8  # 8-token shingles, the contamination-screen gram size


def _duck_novelty_shingles() -> str:
    k = _NOV_K
    return (
        "list_distinct(list_transform("
        f" range(1, greatest(len(string_split(text, ' ')) - {k - 1}, 1) + 1),"
        f" i -> array_to_string(list_slice(string_split(text, ' '), i, i + {k - 1}), ' ')))"
    )


@query(
    "q_ngram_novelty",
    oracle=f"""
    WITH batch AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
    corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
    bg AS (
        SELECT doc_id, unnest({_duck_novelty_shingles()}) AS g FROM batch
    ),
    cg AS (
        SELECT DISTINCT unnest({_duck_novelty_shingles()}) AS g FROM corpus
    )
    SELECT bg.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN cg.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           {sql_srnd(
               "CAST(sum(CASE WHEN cg.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE)"
               " / count(*)", 4)} AS novelty
    FROM bg LEFT JOIN cg ON bg.g = cg.g
    GROUP BY bg.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus n-gram novelty (C48): for an arriving batch (every
    10th doc stands in), the fraction of its distinct 8-grams never
    seen in the existing corpus — the "how much new information does
    this crawl add" admission metric that complements C11's
    contamination screen (C11 asks "does it overlap a blocklist";
    this asks "does it overlap everything we already have").

    Scale shape: both sides explode to per-doc-distinct grams
    (row-local); the corpus side dedups with a map-side-combining
    DISTINCT, then ONE gram-keyed shuffle join marks seen grams — the
    batch side is the small stream, the corpus gram set is the big
    build side, so at 100 TB this is the shape where the corpus grams
    live bucketed-by-gram on disk and the batch probes them
    shuffle-free. The per-doc rollup is a doc-keyed partial agg.
    """
    from cassowary_spark.operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    # r14: grams shuffle/join as xxhash64 longs, not 8-gram strings —
    # the corpus-side DISTINCT and the seen-join carry 8 bytes per
    # gram instead of ~50 (guide §2.3; dedup-family ~1e-12 collision
    # tolerance, a collision can only mark one gram seen).
    bg = batch.select(
        "doc_id", F.explode(shingles("text", _NOV_K)).alias("g0")
    ).select("doc_id", F.xxhash64("g0").alias("g"))
    from cassowary_spark.operators.skew import spread_narrow_input

    # r15: the corpus-side gram explode (9/10 of the docs) ran inside
    # a 1-2-task scan stage; spread only when under-parallel (no-op
    # at corpus scale)
    cg = (
        spread_narrow_input(corpus, "doc_id")
        .select(F.explode(shingles("text", _NOV_K)).alias("g0"))
        .select(F.xxhash64("g0").alias("g"))
        .distinct()
    )
    seen = cg.withColumn("__seen", F.lit(1))
    j = bg.join(seen, "g", "left")
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_novel"),
        srnd(
            F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0)).cast("double")
            / F.count("*"),
            4,
        ).alias("novelty"),
    )


# ------------------------------------------------- C49 embedding centering

_CENTER_OUT_DIMS = 4  # components surfaced for the oracle hash


@query(
    "q_embed_center",
    oracle=f"""
    WITH comp AS (
        SELECT i AS pos, {sql_srnd("avg(embedding[i])", 4)} AS mu
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) t(i)
        GROUP BY i
    ),
    m AS (SELECT list(mu ORDER BY pos) AS mv FROM comp),
    cent AS (
        SELECT vec_id,
               list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[i] AS DOUBLE) - m.mv[i]) AS c
        FROM embeddings, m
    ),
    n AS (
        SELECT vec_id, c,
               sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm
        FROM cent
    )
    SELECT vec_id,
           {sql_srnd("nrm", 6)} AS norm,
           {", ".join(
               f'{sql_srnd(f"c[{i + 1}] / nrm", 6)} AS c{i}'
               for i in range(_CENTER_OUT_DIMS)
           )}
    FROM n
    """,
)
def q_embed_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding mean-centering + L2 renormalization (C49): subtract
    the corpus mean vector and renormalize — the preprocessing that
    makes C43's sign-bit quantization informative (signs of CENTERED
    components split the corpus evenly per dim) and cosine geometry
    isotropic. Output: the new norm and the first 4 renormalized
    components (the value-hash surface; the full vector stays an
    array at scale).

    Scale shape: the mean is ONE (pos)-keyed shuffle whose output is
    dim rows — corpus-independent — collapsed to a single broadcast
    array; centering + the norm are row-local fixed-order positional
    folds. No second corpus shuffle, nothing collected.

    Determinism: mean components srnd-quantized BEFORE centering (the
    avg is the one order-varying reduction); the norm fold is
    positional, so identical inputs give bit-identical doubles in
    both engines.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comp = (
        e.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(srnd(F.avg("val"), 4).alias("mu"))
    )
    m = comp.agg(
        F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias("__s")
    ).select(F.expr("transform(__s, x -> x.mu)").alias("mv"))
    cent = e.crossJoin(F.broadcast(m)).select(
        "vec_id",
        F.expr(
            "zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), mv,"
            " (a, b) -> a - b)"
        ).alias("c"),
    )
    n = cent.select(
        "vec_id",
        "c",
        F.sqrt(
            F.expr(
                "aggregate(c, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)"
            )
        ).alias("nrm"),
    )
    return n.select(
        "vec_id",
        srnd("nrm", 6).alias("norm"),
        *[
            srnd(F.expr(f"c[{i}]") / F.col("nrm"), 6).alias(f"c{i}")
            for i in range(_CENTER_OUT_DIMS)
        ],
    )


# ------------------------------------------------- C50 token-budget trim

_BUDGET_TOKENS = 20_000  # per-source token budget


@query(
    "q_token_budget_trim",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               md5(text) AS pri
        FROM documents
    ),
    r AS (
        SELECT *, CAST(sum(n_toks) OVER (
                   PARTITION BY source ORDER BY pri, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_toks
        FROM t
    )
    SELECT doc_id, source, n_toks, cum_toks
    FROM r WHERE cum_toks <= {_BUDGET_TOKENS}
    """,
)
def q_token_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget trim (C50): keep documents per source,
    in content-stable hash priority order, until the source's token
    budget is spent — the BUDGET-denominated sibling of C24's count
    cap (crawl pipelines budget tokens, not documents, because doc
    length varies 100×). Hash priority makes the kept set identical
    across reruns and engines regardless of arrival order.

    Scale shape: token counting is row-local; ONE source-keyed
    shuffle feeds a running-sum window; the budget predicate is a
    row-local filter on the cumulative sum. Integer-exact end-to-end
    — the kept row set can never flip on a float boundary.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        F.md5("text").alias("pri"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = t.withColumn("cum_toks", F.sum("n_toks").over(w))
    return r.filter(F.col("cum_toks") <= _BUDGET_TOKENS).select(
        "doc_id", "source", "n_toks", "cum_toks"
    )


# ------------------------------------------------- C51 BPE merge training

_BPE_STEPS = 3


def _bpe_oracle(steps: int) -> str:
    """Unrolled DuckDB mirror of the greedy BPE merge loop: per step,
    count frequency-weighted adjacent symbol pairs over the current
    vocab sequences, pick the (cnt DESC, pair ASC) argmax, and apply
    it with the same left-greedy string fold the Spark side runs."""
    ctes = [
        "wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM ("
        "SELECT unnest(string_split(text, ' ')) AS word FROM documents"
        ") WHERE word <> '' GROUP BY word)",
        "v1 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq,"
        " freq FROM wf)",
    ]
    for k in range(1, steps + 1):
        ctes.append(
            f"p{k} AS (SELECT s[i] AS a, s[i + 1] AS b, freq FROM ("
            f"SELECT string_split(seq, ' ') AS s, freq FROM v{k}"
            f"), UNNEST(range(1, len(s))) u(i))"
        )
        ctes.append(
            f"b{k} AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt"
            f" FROM p{k} GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        ctes.append(
            f"v{k + 1} AS (SELECT list_reduce(string_split(seq, ' '),"
            f" (acc, x) -> CASE WHEN (acc = b{k}.a OR"
            f" ends_with(acc, ' ' || b{k}.a)) AND x = b{k}.b"
            f" THEN substr(acc, 1, length(acc) - length(b{k}.a))"
            f" || b{k}.a || b{k}.b"
            f" ELSE acc || ' ' || x END) AS seq, freq FROM v{k}, b{k})"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, a AS left_sym, b AS right_sym,"
        f" a || b AS merged, cnt FROM b{k}"
        for k in range(1, steps + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


@query("q_bpe_merges", oracle=_bpe_oracle(_BPE_STEPS))
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training (C51): run C40's pair-count argmax THREE
    times, applying each winning merge to the vocabulary's symbol
    sequences before recounting — the actual tokenizer-training loop,
    producing the ordered merge table (the artifact a BPE tokenizer
    ships). Merge application is the standard left-greedy fold:
    "a a a" under merge (a,a) becomes "aa a", never "a aa".

    Scale shape: everything runs over the VOCAB frame (one term-keyed
    shuffle builds it; it only shrinks as merges apply), never the
    corpus. Each step is pair-explode (map-local) → alphabet²-keyed
    partial-agg groupBy → a 1-ROW argmax broadcast back via crossJoin
    — the winning pair reaches the fold as a column, so no step
    collects anything to the driver. Step count is fixed (bounded
    plan, no convergence polling); a production trainer checkpoints
    the vocab frame every ~50 merges to truncate lineage, the same
    treatment as C13's connected components.

    Determinism: counts are exact integers; the argmax tie-breaks on
    the pair lexicographically; the fold orders are identical by
    construction (probed cross-engine).
    """
    d = load_table(spark, sf_dir, "documents").select("text")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    cur = wf.select(
        F.expr("trim(regexp_replace(word, '(.)', '$1 '))").alias("seq"), "freq"
    )
    merge_rows = []
    for step in range(1, _BPE_STEPS + 1):
        pairs = (
            cur.filter(F.size(F.split("seq", " ")) >= 2)
            .select(
                F.expr(
                    "explode(transform(sequence(1, size(split(seq, ' ')) - 1),"
                    " i -> struct(element_at(split(seq, ' '), i) AS a,"
                    " element_at(split(seq, ' '), i + 1) AS b)))"
                ).alias("p"),
                "freq",
            )
            .select("p.a", "p.b", "freq")
        )
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(
                F.col("a").alias("__ba"),
                F.col("b").alias("__bb"),
                F.col("cnt").alias("__bcnt"),
            )
        )
        merge_rows.append(
            best.select(
                F.lit(step).alias("step"),
                F.col("__ba").alias("left_sym"),
                F.col("__bb").alias("right_sym"),
                F.concat("__ba", "__bb").alias("merged"),
                F.col("__bcnt").alias("cnt"),
            )
        )
        cur = (
            cur.crossJoin(F.broadcast(best))
            .select(
                F.expr(
                    "aggregate(split(seq, ' '), CAST('' AS STRING), (acc, x) ->"
                    " CASE WHEN (acc = __ba OR endswith(acc, concat(' ', __ba)))"
                    " AND x = __bb"
                    " THEN concat(substring(acc, 1, length(acc) - length(__ba)),"
                    " concat(__ba, __bb))"
                    " ELSE CASE WHEN acc = '' THEN x"
                    " ELSE concat(acc, ' ', x) END END)"
                ).alias("seq"),
                "freq",
            )
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out
