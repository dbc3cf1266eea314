"""Training-data pipeline operators, round 5 second wave (SURVEY.md §2
C35-C42).

Eight more ops a large-scale curation pipeline runs: sliding-window
exact-substring dedup accounting, nearest-centroid assignment (the
k-means E-step completing C22's M-step), a Gopher-style quality-rule
gauntlet, per-key z-score outlier flagging, an integer-exact PageRank
over a bipartite engagement graph, the BPE pair-count inner loop of
tokenizer training, percentile-band distribution trimming, and
matryoshka embedding truncation. The same determinism discipline as
datapipe.py: integer arithmetic wherever a comparison or branch
depends on it, ``srnd`` on every float output, and float reductions
only in fixed (positional) order so both engines produce bit-identical
doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------------------- C35 substring dedup spans

_SPAN_K = 8  # tokens per sliding window


@query(
    "q_substring_dedup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        WHERE len(string_split(text, ' ')) >= {_SPAN_K}
    ),
    sp AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(tk, i, i + {_SPAN_K - 1}), ' '))
                   AS span_hash
        FROM t, UNNEST(range(1, len(tk) - {_SPAN_K} + 2)) u(i)
    ),
    cc AS (
        SELECT doc_id,
               count(*) OVER (PARTITION BY span_hash) AS c
        FROM sp
    )
    SELECT doc_id,
           count(*) AS n_span,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_span,
           {sql_srnd(
               "CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE)"
               " / count(*)", 4)} AS dup_frac
    FROM cc GROUP BY doc_id
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window exact-substring dedup accounting (C35): every
    8-token window of every document, hashed; a window occurring more
    than once anywhere in the corpus (any document, any alignment) is
    a duplicated span. Per-doc output: total spans, duplicated spans,
    duplicated fraction — the exact-substring counterpart of the
    line-level dedup (C18) that catches boilerplate repeated at
    arbitrary offsets, the signal behind suffix-array-style "dedup the
    repeated spans out of the training set" passes.

    Scale shape: span generation is map-local (explode over an integer
    sequence + ``slice``, all JVM); corpus-wide occurrence counts come
    from ONE window keyed by span_hash — no self-join, and the key is
    a 128-bit hash so the shuffle is skew-free by construction. The
    per-doc rollup is an ordinary partial-agg groupBy. Stride is 1
    (every alignment); at 100 TB the same plan runs with a larger
    stride or a `mod` sampler on the window index — a row-local knob.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.select("doc_id", F.split("text", " ").alias("__tk")).filter(
        F.size("__tk") >= _SPAN_K
    )
    spans = base.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.size("__tk") - _SPAN_K + 1)
        ).alias("__i"),
        "__tk",
    ).select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice("__tk", F.col("__i"), _SPAN_K))
        ).alias("span_hash"),
    )
    w = Window.partitionBy("span_hash")
    cc = spans.withColumn("__c", F.count("*").over(w))
    return cc.groupBy("doc_id").agg(
        F.count("*").alias("n_span"),
        F.sum(F.when(F.col("__c") > 1, 1).otherwise(0)).alias("n_dup_span"),
        srnd(
            F.sum(F.when(F.col("__c") > 1, 1).otherwise(0)).cast("double")
            / F.count("*"),
            4,
        ).alias("dup_frac"),
    )


# ------------------------------------------------ C36 nearest-centroid assign


@query(
    "q_centroid_assign",
    oracle=f"""
    WITH comp AS (
        SELECT label, i AS pos,
               floor(avg(embedding[i]) * 10000.0 + 0.5) / 10000.0 AS cv
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) t(i)
        GROUP BY label, i
    ),
    cent AS (
        SELECT label AS c_label, list(cv ORDER BY pos) AS c
        FROM comp GROUP BY label
    ),
    dist AS (
        SELECT e.vec_id, c.c_label,
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                   i -> (CAST(e.embedding[i] AS DOUBLE) - c.c[i])
                      * (CAST(e.embedding[i] AS DOUBLE) - c.c[i]))) AS d2
        FROM embeddings e CROSS JOIN cent c
    ),
    ranked AS (
        SELECT vec_id, c_label, d2,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, c_label
               ) AS rn
        FROM dist
    )
    SELECT vec_id, c_label AS label_assigned, {sql_srnd("d2", 6)} AS d2
    FROM ranked WHERE rn = 1
    """,
)
def q_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (C36) — the E-step of distributed
    k-means and the topic-bucketing / routing primitive of embedding
    pipelines: build per-label centroids (C22's M-step), then assign
    every vector to its closest centroid by squared euclidean
    distance, ties broken on label.

    Determinism: centroid components are rounded (srnd 4) BEFORE the
    distance computation, so the one reduction whose order varies by
    partitioning (the avg) is quantized away; the distance itself is a
    fixed-order positional fold over doubles — ``aggregate(zip_with)``
    in Spark, ``list_sum(list_transform)`` in DuckDB — bit-identical
    given identical inputs, so the argmin never flips cross-engine.

    Scale shape: the M-step is one (label, pos)-keyed shuffle (output
    = labels x dim, corpus-size-independent); centroids collapse to K
    rows of arrays and BROADCAST; the E-step is then a map-local
    crossJoin (corpus x K) + a vec_id-keyed partial-agg ``min(struct)``
    — no window over the corpus, no second corpus shuffle beyond the
    argmin groupBy, which combines map-side.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    comp = (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(srnd(F.avg("val"), 4).alias("cv"))
    )
    cent = (
        comp.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("__s"))
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(__s, x -> x.cv)").alias("c"),
        )
    )
    dist = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "c_label",
        F.expr(
            "aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), c,"
            " (a, b) -> (a - b) * (a - b)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("d2"),
    )
    m = dist.groupBy("vec_id").agg(
        F.min(F.struct("d2", "c_label")).alias("__m")
    )
    return m.select(
        "vec_id",
        F.col("__m.c_label").alias("label_assigned"),
        srnd(F.col("__m.d2"), 6).alias("d2"),
    )


# ------------------------------------------------- C37 quality-rule gauntlet

_GAUNT_MIN_WORDS = 20
_GAUNT_MAX_WORDS = 80
_GAUNT_MIN_WLEN = 3  # mean word length lower bound
_GAUNT_MAX_WLEN = 8  # mean word length upper bound


@query(
    "q_quality_gauntlet",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               length(replace(text, ' ', '')) AS n_letters,
               CAST(list_contains(string_split(text, ' '), 'the')
                    OR list_contains(string_split(text, ' '), 'a')
                    AS INT) AS r_stop
        FROM documents
    )
    SELECT doc_id, n_words,
           CAST(n_words >= {_GAUNT_MIN_WORDS}
                AND n_words <= {_GAUNT_MAX_WORDS} AS INT) AS r_len,
           CAST(n_letters >= {_GAUNT_MIN_WLEN} * n_words
                AND n_letters <= {_GAUNT_MAX_WLEN} * n_words AS INT)
               AS r_wordlen,
           r_stop,
           CAST(n_words >= {_GAUNT_MIN_WORDS}
                AND n_words <= {_GAUNT_MAX_WORDS}
                AND n_letters >= {_GAUNT_MIN_WLEN} * n_words
                AND n_letters <= {_GAUNT_MAX_WLEN} * n_words
                AND r_stop = 1 AS INT) AS passed
    FROM m
    """,
)
def q_quality_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule gauntlet (C37): the rule battery a
    pretraining pipeline applies before any model-based scoring —
    word-count bounds, mean-word-length bounds, stopword presence —
    each emitted as its own flag plus the conjunction, so downstream
    analysis can attribute rejections to rules.

    Every rule is an INTEGER comparison (mean word length is tested as
    ``min*n <= letters <= max*n`` — never a float division), so flags
    are exact on every engine. Scale shape: pure row-local JVM
    expressions evaluated at the scan, ZERO shuffle — the cheapest
    pass in the pipeline, which is why production filters run it
    first.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    n_words = F.size(words)
    n_letters = F.length(F.regexp_replace("text", " ", ""))
    r_len = (n_words >= _GAUNT_MIN_WORDS) & (n_words <= _GAUNT_MAX_WORDS)
    r_wordlen = (n_letters >= _GAUNT_MIN_WLEN * n_words) & (
        n_letters <= _GAUNT_MAX_WLEN * n_words
    )
    r_stop = F.array_contains(words, "the") | F.array_contains(words, "a")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        r_len.cast("int").alias("r_len"),
        r_wordlen.cast("int").alias("r_wordlen"),
        r_stop.cast("int").alias("r_stop"),
        (r_len & r_wordlen & r_stop).cast("int").alias("passed"),
    )


# --------------------------------------------------- C38 z-score outliers

_Z_THRESHOLD = 2.5


@query(
    "q_value_outliers",
    oracle=f"""
    WITH st AS (
        SELECT event_id, user_id, value,
               avg(value) OVER (PARTITION BY user_id) AS mu,
               stddev_samp(value) OVER (PARTITION BY user_id) AS sd,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    ),
    z AS (
        SELECT event_id, user_id, value,
               {sql_srnd("(value - mu) / sd", 4)} AS z
        FROM st WHERE n >= 2 AND sd > 0
    )
    SELECT event_id, user_id, value, z
    FROM z WHERE abs(z) > {_Z_THRESHOLD}
    """,
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key z-score outlier flagging (C38): events whose value sits
    more than 2.5 sample standard deviations from their user's mean —
    the per-entity anomaly screen a pipeline runs before aggregating
    metrics that a single corrupt reading would poison.

    The filter compares the ROUNDED z (srnd 4) against the threshold,
    so the admitted row set is a function of values both engines agree
    on — the raw mean/stddev reductions (whose last-ulp depends on
    partition order) are quantized away before any branch. Degenerate
    groups (n < 2, zero variance) are excluded on both sides.

    Scale shape: mean/stddev/count share ONE user_id-keyed window
    shuffle (same-key frames collapse into a single Exchange); the
    z-filter is row-local after it. No join, no second shuffle.
    """
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id")
    st = e.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("__mu"),
        F.stddev_samp("value").over(w).alias("__sd"),
        F.count("*").over(w).alias("__n"),
    )
    z = st.filter((F.col("__n") >= 2) & (F.col("__sd") > 0)).select(
        "event_id",
        "user_id",
        "value",
        srnd((F.col("value") - F.col("__mu")) / F.col("__sd"), 4).alias("z"),
    )
    return z.filter(F.abs("z") > _Z_THRESHOLD)


# --------------------------------------------------- C39 integer PageRank

_PR_SCALE = 1_000_000_000_000  # rank unit = 1e-12
_PR_ITERS = 3
# damping 0.85 as the integer fraction 17/20


def _pr_oracle() -> str:
    """Unrolled 3-iteration integer PageRank in DuckDB SQL — the same
    floor-division formula the Spark loop applies, so ranks are exact
    integers on both engines."""
    iters = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
        SELECT e.dst AS node,
               ({_PR_SCALE} * 3) // (20 * (SELECT n FROM n))
               + CAST(sum((r.rank * 17) // (20 * d.deg)) AS BIGINT) AS rank
        FROM edges e
        JOIN {prev} r ON r.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    )"""
        )
        prev = f"r{i}"
    joined = ",\n    ".join(iters)
    return f"""
    WITH pairs AS (
        SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
                        't:' || event_type AS t
        FROM events
    ),
    edges AS (
        SELECT u AS src, t AS dst FROM pairs
        UNION ALL
        SELECT t AS src, u AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT src AS node,
                  {_PR_SCALE} // (SELECT n FROM n) AS rank
           FROM deg),
    {joined}
    SELECT node, rank FROM r{_PR_ITERS}
    """


@query("q_graph_pagerank", oracle=_pr_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (C39) over the bipartite user/event-type
    engagement graph (edges symmetrized) — the graph-propagation
    quality signal pipelines compute over link or interaction graphs,
    here with EVERY arithmetic step in scaled integer space
    (rank unit 1e-12, damping 17/20, all divisions floored) so three
    power iterations produce bit-identical longs on any engine and any
    partitioning — no float sum whose value depends on reduction
    order.

    Scale shape: the same iterative discipline as connected components
    (C13): per-iteration cost is one edge⋈rank equi-join keyed by src
    (deg is pre-joined onto the edge list once, so iterations reuse
    that co-partitioned lineage) + one dst-keyed partial-agg groupBy.
    State per iteration = one long per node; the iteration count is
    fixed (3), so no driver-side convergence polling at all. The
    node-count scalar rides a 1-row broadcast.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    pairs = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = pairs.select(F.col("u").alias("src"), F.col("t").alias("dst")).unionByName(
        pairs.select(F.col("t").alias("src"), F.col("u").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # pre-join degree onto edges once; every iteration reuses this lineage
    edges_d = edges.join(deg, "src")
    n_df = deg.agg(F.count("*").alias("__n"))

    rank = deg.crossJoin(F.broadcast(n_df)).select(
        F.col("src").alias("node"),
        F.expr(f"{_PR_SCALE} div __n").alias("rank"),
    )
    for _ in range(_PR_ITERS):
        contrib = edges_d.join(
            rank, edges_d["src"] == rank["node"]
        ).select(
            F.col("dst"),
            F.expr("(rank * 17) div (20 * deg)").alias("__c"),
        )
        rank = (
            contrib.groupBy("dst")
            .agg(F.sum("__c").alias("__s"))
            .crossJoin(F.broadcast(n_df))
            .select(
                F.col("dst").alias("node"),
                F.expr(f"({_PR_SCALE} * 3) div (20 * __n) + __s").alias("rank"),
            )
        )
    return rank


# --------------------------------------------------- C40 BPE pair counts

_BPE_MIN_COUNT = 50


@query(
    "q_bpe_pairs",
    oracle=f"""
    WITH wf AS (
        SELECT term AS word, count(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ) GROUP BY term
    ),
    pairs AS (
        SELECT substr(word, i, 2) AS pair, freq
        FROM wf, UNNEST(range(1, length(word))) u(i)
        WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    HAVING sum(freq) >= {_BPE_MIN_COUNT}
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE pair counting (C40) — the inner loop of byte-pair-encoding
    tokenizer training: weight every adjacent character pair by its
    word's corpus frequency and count pair mass (the statistic whose
    argmax becomes the next merge rule). Overlapping occurrences
    count, like the reference BPE algorithm ("aaa" contributes "aa"
    twice).

    Scale shape: the word-frequency table is one term-keyed shuffle
    with map-side combine (vocabulary-sized, NOT corpus-sized — the
    whole point of counting pairs over the vocab instead of the raw
    text); pair explosion is map-local over that compact frame, and
    the pair groupBy's key space is alphabet², tiny. All counts are
    exact integers. A full BPE trainer iterates this query against a
    vocab frame whose words shrink as merges apply — each iteration
    reuses this exact plan.
    """
    d = load_table(spark, sf_dir, "documents").select("text")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = (
        wf.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.length("word") - 1)
            ).alias("__i"),
            "word",
            "freq",
        )
        .select(F.expr("substring(word, __i, 2)").alias("pair"), "freq")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .filter(F.col("cnt") >= _BPE_MIN_COUNT)
    )


# ----------------------------------------------- C41 percentile band filter

_BAND_LO = 0.05
_BAND_HI = 0.95


@query(
    "q_length_band",
    oracle=f"""
    WITH th AS (
        SELECT {sql_srnd(f"quantile_cont(n_chars, {_BAND_LO})", 4)} AS lo,
               {sql_srnd(f"quantile_cont(n_chars, {_BAND_HI})", 4)} AS hi
        FROM documents
    )
    SELECT doc_id, n_chars FROM documents, th
    WHERE n_chars >= lo AND n_chars <= hi
    """,
)
def q_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band distribution trimming (C41): keep documents
    whose length sits inside the corpus's [P5, P95] band — the
    "cut both tails" pass pipelines run to drop fragments and
    concatenation monsters without hand-tuned thresholds.

    Determinism: thresholds are linear-interpolated percentiles of an
    INTEGER column — the identical lerp formula on the identically
    sorted values in both engines — then rounded (srnd 4) before the
    comparison, so the admitted row set is engine-stable. Scale shape:
    the threshold agg is one pass; at 100 TB you'd swap exact
    ``percentile`` for ``approx_percentile`` (t-digest, mergeable,
    map-side combined) and widen the band guard — noted here because
    the exact form's global sort-by-key is the one non-scalable step;
    the thresholds then ride a 1-row broadcast crossJoin into a
    row-local filter.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    th = d.agg(
        srnd(F.expr(f"percentile(n_chars, {_BAND_LO})"), 4).alias("lo"),
        srnd(F.expr(f"percentile(n_chars, {_BAND_HI})"), 4).alias("hi"),
    )
    return (
        d.crossJoin(F.broadcast(th))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "n_chars")
    )


# ------------------------------------------------ C42 matryoshka truncation

_MAT_DIM = 16


@query(
    "q_matryoshka",
    oracle=f"""
    WITH t AS (
        SELECT vec_id,
               list_transform(list_slice(embedding, 1, {_MAT_DIM}),
                              x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM t
    )
    SELECT vec_id,
           {sql_srnd("nrm", 6)} AS norm16,
           array_to_string(list_transform(v,
               x -> CAST(CAST(floor(x / nrm * 1000000.0 + 0.5) AS BIGINT)
                         AS VARCHAR)), ',') AS vec16
    FROM n WHERE nrm > 0
    """,
)
def q_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka embedding truncation (C42): keep the first 16
    dimensions and L2-renormalize — how matryoshka-trained embeddings
    are cheapened for serving (4x less vector bytes at a small recall
    cost), run as a corpus-wide transform before indexing.

    Determinism: the slice is positional; the norm is a fixed-order
    positional fold over doubles (``aggregate`` / ``list_sum`` — same
    IEEE sequence both engines); every output component is quantized
    to integer micro-units (floor(x/nrm*1e6+0.5)) after the division.
    Zero-norm prefixes are excluded on both sides (division guard).
    Scale shape: entirely row-local JVM/array ops — ZERO shuffle, runs
    at scan throughput, output partitioning inherits the scan's.

    Output encoding: vec16 ships as a comma-joined string of int64
    micro-unit components, not an ARRAY — the driver's canonicalizer
    cannot order list cells (r7 adjudication error); atomic output
    columns are enforced by ``oracle.compare``. Integer rendering is
    engine-stable (no float-format divergence).
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    v = F.expr(
        f"transform(slice(embedding, 1, {_MAT_DIM}), x -> CAST(x AS DOUBLE))"
    )
    t = e.select("vec_id", v.alias("__v"))
    n = t.withColumn(
        "__nrm",
        F.sqrt(
            F.expr(
                "aggregate(transform(__v, x -> x * x),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            )
        ),
    )
    return n.filter(F.col("__nrm") > 0).select(
        "vec_id",
        srnd(F.col("__nrm"), 6).alias("norm16"),
        F.expr(
            "array_join(transform(__v, x ->"
            " CAST(CAST(floor(x / __nrm * 1000000.0D + 0.5D) AS BIGINT)"
            " AS STRING)), ',')"
        ).alias("vec16"),
    )
