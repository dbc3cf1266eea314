"""Training-data pipeline operators, round 5 (SURVEY.md §2 C25-C34).

Ten ops a 100 TB curation pipeline runs daily: normalization-aware
dedup, inverted-index build, sketch-prefiltered heavy hitters,
per-source corpus mixing, unigram-LM quality scoring, hot-key skew
diagnostics, small-file compaction planning, sliding-window document
chunking, Z-order layout clustering, and PMI collocation mining.
Every query is
oracle-gated; float outputs go through ``srnd`` (stable half-up
rounding, see exprs.py) and every stochastic-looking choice (sampling,
mixing) is a deterministic integer hash computed identically in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.operators.sketch import cms_build, cms_estimate
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

TWIN_OFFSET = 100_000

_TOK_SQL = "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents"


# ------------------------------------------------------- C25 normalized dedup


@query(
    "q_dedup_normalized",
    oracle=f"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {TWIN_OFFSET} AS doc_id, upper(text) || '  !!' AS text
        FROM documents
    ),
    norm AS (
        SELECT doc_id,
               sha256(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash
        FROM all_docs
    )
    SELECT norm_hash, min(doc_id) AS keep_id, count(*) AS n_variants
    FROM norm GROUP BY norm_hash
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup (C25): collapse formatting
    variants — case, punctuation, whitespace runs — that byte-level
    hashing misses. The fixture has no such variants, so a twin corpus
    (uppercased, doubled spaces, trailing ``!!``) is unioned in; a
    correct normalizer maps every twin onto its original, leaving
    exactly ``n_variants = 2`` per cluster.

    Scale shape: normalization is a per-row JVM regexp chain (zero
    shuffle); the dedup itself is the same sha-keyed groupBy as C1
    with map-side partial aggregation. Only the 32-byte hash + id
    shuffles — never the text.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twin = d.select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""), r" +", " "
        )
    )
    return (
        d.unionByName(twin)
        .select("doc_id", F.sha2(norm, 256).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_variants"))
    )


# ------------------------------------------------------- C26 inverted index


@query(
    "q_inverted_index",
    oracle=f"""
    WITH tok AS (SELECT DISTINCT doc_id, term FROM ({_TOK_SQL}))
    SELECT term,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings,
           CAST(count(*) AS INT) AS df
    FROM tok GROUP BY term
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (C26): term → sorted postings list of
    doc_ids + document frequency — the layout retrieval and
    contamination tooling consume.

    Scale shape: explode is map-local, the (doc,term) distinct and the
    term groupBy share one term-keyed shuffle lineage with map-side
    combine. Postings arrive sorted via ``sort_array`` so the output
    is deterministic. At web scale a term's postings outgrow one row —
    the production layout shards postings by ``doc_id`` range (same
    groupBy with a range-bucket in the key); single-row postings keep
    the oracle exact here.

    Output encoding: postings ship as a comma-joined string, not an
    ARRAY — the driver's canonicalizer sorts raw result columns with
    pandas and cannot order list cells (r7 adjudication error), so
    oracle-gated queries must emit atomic columns only (enforced by
    ``oracle.compare``). The join order is the sorted doc_id order on
    both engines, so the string is deterministic.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    idx = tok.groupBy("term").agg(
        F.sort_array(F.collect_set("doc_id")).alias("__p"),
        F.count("*").cast("int").alias("df"),
    )
    return idx.select(
        "term",
        F.expr("array_join(transform(__p, x -> CAST(x AS STRING)), ',')").alias(
            "postings"
        ),
        "df",
    )


# ------------------------------------------------------- C27 heavy hitters


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH tok AS ({_TOK_SQL}),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT term, count(*) AS cnt
    FROM tok GROUP BY term
    HAVING count(*) * 30 >= (SELECT n FROM tot)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-prefiltered heavy hitters (C27): find every term holding
    ≥ 1/30 of all token mass, exactly, without an exact full-vocabulary
    count as the first pass.

    Two-pass shape: pass 1 builds a count-min sketch (operators/
    sketch.py) — a groupBy whose post-combine cardinality is the fixed
    depth·width grid, not the vocabulary — then estimates each distinct
    term against the broadcast sketch. CMS never undercounts, so
    ``est ≥ threshold`` admits every true heavy hitter (plus a few
    collision-inflated impostors). Pass 2 exact-counts ONLY the
    candidate terms (tokens semi-join the broadcast candidate set) and
    re-applies the threshold, discarding impostors. The oracle is the
    plain exact HAVING — the gate proves the sketch path loses nothing.
    The threshold compare is integer (`cnt·30 ≥ total`), cross-engine
    exact.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select(F.explode(F.split("text", " ")).alias("term"))
    tot = tok.agg(F.count("*").alias("__n"))

    sketch = cms_build(tok, "term")
    est = cms_estimate(tok.select("term").distinct(), sketch, "term")
    cand = (
        est.crossJoin(F.broadcast(tot))
        .filter(F.col("est") * 30 >= F.col("__n"))
        .select("term")
    )
    exact = (
        tok.join(F.broadcast(cand), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * 30 >= F.col("__n"))
        .select("term", "cnt")
    )


# ------------------------------------------------------- C28 corpus mixing


_MIX_HASH = 2654435761  # Knuth multiplicative hash constant
_MIX_MOD = 4294967296  # 2^32
# acceptance thresholds as integer fractions of 2^32: 100%, 50%, 25%, 10%
_MIX_THRESHOLDS = (4294967296, 2147483648, 1073741824, 429496729)


@query(
    "q_corpus_mix",
    oracle=f"""
    WITH rated AS (
        SELECT doc_id, source,
               CAST(substr(source, 4) AS INT) AS sfx,
               (CAST(doc_id AS BIGINT) * {_MIX_HASH}) % {_MIX_MOD} AS h
        FROM documents
    )
    SELECT doc_id, source FROM rated
    WHERE h < CASE WHEN sfx < 5 THEN {_MIX_THRESHOLDS[0]}
                   WHEN sfx < 10 THEN {_MIX_THRESHOLDS[1]}
                   WHEN sfx < 15 THEN {_MIX_THRESHOLDS[2]}
                   ELSE {_MIX_THRESHOLDS[3]} END
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus mixing (C28): downsample each source to its
    mixture weight (100% / 50% / 25% / 10% by source tier) — how a
    training run rebalances web vs curated data.

    The accept/reject decision is a deterministic multiplicative hash
    of doc_id compared against the weight as an integer fraction of
    2^32 — a pure row-local predicate. Zero shuffle, no RNG state, and
    the exact same row set on every engine and every re-run (the
    property that makes mixes reproducible across pipeline stages).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sfx = F.substring("source", 4, 10).cast("int")
    h = (F.col("doc_id").cast("long") * F.lit(_MIX_HASH)) % F.lit(_MIX_MOD)
    thr = (
        F.when(sfx < 5, F.lit(_MIX_THRESHOLDS[0]))
        .when(sfx < 10, F.lit(_MIX_THRESHOLDS[1]))
        .when(sfx < 15, F.lit(_MIX_THRESHOLDS[2]))
        .otherwise(F.lit(_MIX_THRESHOLDS[3]))
    )
    return d.filter(h < thr).select("doc_id", "source")


# ------------------------------------------------------- C29 unigram LM score


@query(
    "q_unigram_logprob",
    oracle=f"""
    WITH tok AS ({_TOK_SQL}),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    sc AS (
        SELECT doc_id, tf,
               sum(tf) OVER (PARTITION BY term) AS cnt_t,
               sum(tf) OVER () AS tot
        FROM tf
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_toks,
           {sql_srnd("ln(sum(tf * cnt_t) / (sum(tf) * max(tot)))", 6)} AS lp
    FROM sc GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score (C29): log of each document's mean
    token probability under the corpus's own unigram model — the
    cheap first-stage perplexity filter of a data pipeline (rare-token
    salads score low, stereotypical text scores high).

    The mean is arithmetic (``ln(Σ tf·cnt_t / (n_toks·total))``), not
    the geometric mean of classic perplexity, deliberately: all
    accumulation happens in exact integer arithmetic and only ONE
    float op (the final ln) runs per document, so the score is
    bit-identical across engines and partitionings — a float sum of
    per-token logs would depend on reduction order. Scale shape is
    q_tfidf's: term totals as a window over the (doc,term) tf frame —
    one term-keyed shuffle, no vocabulary broadcast — then a doc-keyed
    partial agg; the corpus total rides a 1-row crossJoin.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tot = tf.agg(F.sum("tf").alias("__tot"))
    wt = Window.partitionBy("term")
    sc = tf.withColumn("cnt_t", F.sum("tf").over(wt)).crossJoin(F.broadcast(tot))
    return sc.groupBy("doc_id").agg(
        F.sum("tf").alias("n_toks"),
        srnd(
            F.log(
                F.sum(F.col("tf") * F.col("cnt_t"))
                / (F.sum("tf") * F.max("__tot"))
            ),
            6,
        ).alias("lp"),
    )


# ------------------------------------------------------- C30 skew diagnostics


@query(
    "q_skew_stats",
    oracle=f"""
    WITH per_key AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    tot AS (SELECT sum(cnt) AS n FROM per_key)
    SELECT user_id, cnt,
           {sql_srnd("cnt * 100.0 / (SELECT n FROM tot)", 4)} AS share_pct
    FROM per_key
    ORDER BY cnt DESC, user_id ASC
    LIMIT 10
    """,
)
def q_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew diagnostic (C30): the 10 heaviest shuffle keys and
    the share of rows each holds — the report that tells an operator
    whether tomorrow's join needs salting (operators/skew.py) before
    it runs, not after it straggles.

    Scale shape: per-key counts are one partial-aggregated groupBy;
    the top-10 is TakeOrdered (per-partition heaps, no global sort);
    the total rides a 1-row broadcast crossJoin. The share division is
    a single float op on exact integers — deterministic under srnd.
    Ties break on user_id so the cut line is stable cross-engine.
    """
    e = load_table(spark, sf_dir, "events").select("user_id")
    per_key = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = per_key.agg(F.sum("cnt").alias("__n"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            srnd(F.col("cnt") * 100.0 / F.col("__n"), 4).alias("share_pct"),
        )
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(10)
    )


# ------------------------------------------------------- C31 compaction plan


_COMPACT_TARGET = 4096  # bytes per output file (fixture-scaled)


@query(
    "q_compaction_plan",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id, n_chars,
               sum(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS running
        FROM documents
    )
    SELECT source, doc_id, n_chars,
           CAST((running - n_chars) // {_COMPACT_TARGET} AS BIGINT) AS out_file
    FROM sized
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (C31): assign every input
    fragment to a target output file of ~TARGET bytes by start-offset
    bucketing a running byte total per partition — the planning step
    behind OPTIMIZE/compaction jobs that fight the small-files problem
    at ingest scale.

    One window (sum over source, ordered by id) is the entire plan:
    a single source-keyed shuffle, integer arithmetic end-to-end.
    Start-offset bucketing (``(running − size) div target``) means a
    fragment larger than the target gets its own file and assignment
    never depends on float rounding. The fixture treats each document
    as one fragment of ``n_chars`` bytes.
    """
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_offset = F.sum("n_chars").over(w) - F.col("n_chars")
    return d.select(
        "source",
        "doc_id",
        "n_chars",
        # integer start offsets, so floor(double div) is exact
        F.floor(start_offset / F.lit(_COMPACT_TARGET)).alias("out_file"),
    )


# ------------------------------------------------------- C32 doc chunking


_CHUNK_SIZE = 20
_CHUNK_STRIDE = 15  # size - overlap of 5 tokens


@query(
    "q_doc_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    plan AS (
        SELECT doc_id, t, n,
               CASE WHEN n <= {_CHUNK_SIZE} THEN 1
                    ELSE (n - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)
                         // {_CHUNK_STRIDE} + 1 END AS n_chunks
        FROM toks
    ),
    chunks AS (
        SELECT doc_id,
               CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_id,
               t, n
        FROM plan
    )
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
               chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ') AS chunk_text,
           CAST(least(n - chunk_id * {_CHUNK_STRIDE}, {_CHUNK_SIZE}) AS INT)
               AS n_tok
    FROM chunks
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (C32): split every document
    into 20-token chunks with a 5-token overlap — the context-window
    packing step before tokenization in a pretraining or RAG-indexing
    pipeline.

    All array ops (`split`/`sequence`/`slice`/`concat_ws`) are JVM
    built-ins: the explode is map-local, there is NO shuffle at all —
    chunking parallelizes embarrassingly and the output partitioning
    inherits the scan's. Chunk boundaries are integer token indices,
    so the output is deterministic and the DuckDB oracle reproduces it
    exactly (list_slice clamps at the list end just like slice).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.split("text", " ")
    n = F.size(t)
    n_chunks = (
        F.when(n <= _CHUNK_SIZE, F.lit(1))
        .otherwise(
            F.expr(
                f"(size(split(text, ' ')) - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1) "
                f"div {_CHUNK_STRIDE} + 1"
            )
        )
    )
    base = d.select(
        "doc_id",
        t.alias("__t"),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias("chunk_id"),
    )
    return base.select(
        "doc_id",
        "chunk_id",
        F.concat_ws(
            " ",
            F.slice(
                F.col("__t"),
                F.col("chunk_id") * _CHUNK_STRIDE + 1,
                F.lit(_CHUNK_SIZE),
            ),
        ).alias("chunk_text"),
        F.least(
            F.col("__n") - F.col("chunk_id") * _CHUNK_STRIDE, F.lit(_CHUNK_SIZE)
        )
        .cast("int")
        .alias("n_tok"),
    )


# ------------------------------------------------------- C33 z-order layout


_Z_BITS = 16
_Z_FILE_ROWS = 50


def _z_interleave_sql(a: str, b: str, bits: int = _Z_BITS) -> str:
    """Morton interleave as a pure integer expression (same text works
    in Spark SQL and DuckDB: >>, &, |, and * by powers of two)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({b} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH z AS (
        SELECT doc_id, n_chars,
               {_z_interleave_sql("doc_id", "n_chars")} AS zkey
        FROM documents
    ),
    cells AS (
        SELECT zkey, CAST(count(*) AS BIGINT) AS cnt FROM z GROUP BY 1
    ),
    cum AS (
        SELECT zkey, cnt,
               CAST(sum(cnt) OVER (ORDER BY zkey) AS BIGINT) AS cum
        FROM cells
    )
    SELECT z.doc_id, z.n_chars, z.zkey,
           CAST((cum.cum - cum.cnt) // {_Z_FILE_ROWS} AS BIGINT) AS zfile
    FROM z JOIN cum ON z.zkey = cum.zkey
    """,
)
def q_zorder_layout(
    spark: SparkSession, sf_dir: str, *, approx: bool = False
) -> DataFrame:
    """Z-order layout clustering (C33): assign rows to output files
    along a Morton space-filling curve over (doc_id, n_chars), so
    file-level min/max statistics prune scans filtered on EITHER
    dimension — the OPTIMIZE ZORDER BY step of lakehouse table
    maintenance, expressed as a deterministic assignment query.

    The z-key is a pure integer bit-interleave (identical expression
    text runs in both engines — no UDF, codegen-friendly).

    Semantics (r12 re-authoring, the q_equidepth_hist precedent): the
    assignment is TIES-TOGETHER — every row sharing a zkey lands in
    the file of the tie group's FIRST position, zfile =
    (min_rank(zkey) − 1) div {_Z_FILE_ROWS} with min_rank = cum − cnt
    + 1 from the zkey distinct-values counts frame. Tie-invariant: no
    positional tiebreak column exists, so the mapping is a pure
    function of the zkey multiset (a zkey never straddles two files —
    exactly what file-level min/max pruning wants) and the oracle's
    counts-CTE agrees bit-for-bit.

    Scale shape: ONE map-side-combining groupBy collapses the corpus
    to its zkey cells ({_Z_BITS}-bit-per-dim interleave bounds the
    domain at 2^{{2·{_Z_BITS}}} — the same truncated-bit-budget
    convention real lakehouse ZORDER keys use); the running-sum
    window orders THAT frame only (sp_corpus_windows = 0; at extreme
    cell cardinality the documented two-pass distributed prefix-sum
    evolution in operators/ranks.py applies); rows pick up their file
    by a zkey equi-join (AQE broadcasts the cells frame when small).
    In production the write itself is `repartitionByRange(zkey)` —
    ``approx=True`` SHIPS that analogue: file boundaries from one
    approx-quantile sketch of zkey (the same sampling role
    RangePartitioner plays), bucketing row-local — zero value-shuffle;
    files are near-equal-sized instead of exactly ``{_Z_FILE_ROWS}``
    rows (tests/test_ranks.py pins the agreement).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    z = d.withColumn(
        "zkey", F.expr(_z_interleave_sql("doc_id", "n_chars")).cast("long")
    )
    if approx:
        # one LAZY aggregate carries both the zkey rank sketch and the
        # row count (r10-advice fix: no eager z.count() in the query
        # builder — constructing the frame no longer runs a job). The
        # sketch is a fixed-K rank estimator: a row's estimated global
        # position is (#thresholds strictly below zkey)/K · N, and its
        # file is that position div _Z_FILE_ROWS — near-equal files of
        # ~_Z_FILE_ROWS rows, ties together, no corpus sort or window.
        k_sketch = 2048
        st = z.agg(
            F.percentile_approx(
                F.col("zkey").cast("double"),
                [i / k_sketch for i in range(1, k_sketch)],
                10_000,
            ).alias("__th"),
            F.count("*").cast("long").alias("__n"),
        )
        j = z.crossJoin(F.broadcast(st))
        zv = F.col("zkey").cast("double")
        idx = F.aggregate(
            F.col("__th"),
            F.lit(0),
            lambda acc, t: acc + F.when(zv > t, 1).otherwise(0),
        )
        pos = idx.cast("double") / k_sketch * F.col("__n").cast("double")
        return j.select(
            "doc_id",
            "n_chars",
            "zkey",
            F.floor(pos / _Z_FILE_ROWS).cast("long").alias("zfile"),
        )
    cells = z.groupBy("zkey").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.orderBy("zkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "zkey",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
    )
    return z.join(cum, "zkey").select(
        "doc_id",
        "n_chars",
        "zkey",
        ((F.col("cum") - F.col("cnt")) / _Z_FILE_ROWS)
        .cast("long")
        .alias("zfile"),
    )


q_zorder_layout.__doc__ = q_zorder_layout.__doc__.format(
    _Z_BITS=_Z_BITS, _Z_FILE_ROWS=_Z_FILE_ROWS
)


# ------------------------------------------------------- C34 PMI collocations


_PMI_MIN_COUNT = 5


@query(
    "q_pmi_pairs",
    oracle=f"""
    WITH t AS (
        SELECT string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
               unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
        FROM t
    ),
    cb AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2),
    uni AS (
        SELECT term, count(*) AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ) GROUP BY term
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni),
    b AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bg FROM cb)
    SELECT w1, w2, c_ab,
           {sql_srnd(
               "ln((CAST(c_ab AS DOUBLE) * n_tok * n_tok) / "
               "(CAST(n_bg AS DOUBLE) * ua.c * ub.c))", 6)} AS pmi
    FROM cb, n, b
    JOIN uni ua ON ua.term = w1
    JOIN uni ub ON ub.term = w2
    WHERE c_ab >= {_PMI_MIN_COUNT}
    """,
)
def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations (C34): score every
    bigram with support ≥ 5 by ``ln(p(ab) / (p(a)·p(b)))`` — the
    classic collocation / multi-word-expression miner that tokenizer
    and phrase-table pipelines run over a corpus.

    All counts stay exact integers through the aggregation; the ONLY
    float math is one double product/quotient chain plus one ln per
    output row on those exact integers — IEEE-deterministic in both
    engines (the same reduction-order argument as C29). Shape: one
    bigram-keyed shuffle (map-side combined), unigram counts come back
    as a broadcast join (vocab-sized — at a 10^8-term web vocabulary
    you'd swap the two joins for two windows over the bigram frame,
    same semantics, one extra shuffle), and the two scalar totals ride
    1-row crossJoins.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    d2 = d.select(toks.alias("toks")).filter(F.size("toks") >= 2)
    bg = d2.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                " element_at(toks, i + 1) AS w2))"
            )
        ).alias("__bg")
    ).select(F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    uni = (
        d.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    n_tok = uni.agg(F.sum("c").alias("n_tok"))
    n_bg = cb.agg(F.sum("c_ab").alias("n_bg"))
    ua = uni.select(F.col("term").alias("w1"), F.col("c").alias("__ca"))
    ub = uni.select(F.col("term").alias("w2"), F.col("c").alias("__cb"))
    return (
        cb.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bg))
        .select(
            "w1",
            "w2",
            "c_ab",
            srnd(
                F.log(
                    (F.col("c_ab").cast("double") * F.col("n_tok") * F.col("n_tok"))
                    / (F.col("n_bg").cast("double") * F.col("__ca") * F.col("__cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
