"""Training-data pipeline queries (SURVEY.md §2 group C extensions).

The corpus-preparation stages a large-scale LLM data pipeline runs
between "raw crawl" and "tokenized shards": relevance scoring
(TF-IDF), deterministic train/val splitting, context-window packing,
PII redaction, benchmark-contamination screening, and time-series
gap-filling for ingest telemetry. Every query is a row-local or
key-partitioned plan — no global sequential state — so each would
scale to 100 TB by adding executors (per-query notes inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.operators.dedup import shingles_of_tokens
from cassowary_spark.queries.llm import _DOCS_TWINS_SQL, _docs_with_twins, _duck_shingles
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ---------------------------------------------------------------- TF-IDF


@query(
    "q_tfidf",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, count(*) AS dft FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               {sql_srnd("tf.tf * ln(n.n_docs / dfreq.dft)", 6)} AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
        SELECT scored.*,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic relevance score.

    Shape at scale: the explode is map-local; TF is a (doc, term)
    groupBy with map-side partial counts; DF is a second partial-agg
    over terms (cardinality = vocabulary, tiny next to the corpus) and
    comes back as a broadcast-sized join; the corpus count N is one
    scalar crossJoin (BroadcastNestedLoop of a 1-row side). The only
    big shuffle is keyed by term — high cardinality, no skew.

    Ranking uses the ROUNDED score (srnd, 6dp) in both engines so the
    tie-break (term asc) sees identical values — ranking on the raw
    float would let a sub-ulp ln() difference reorder near-ties.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n = d.agg(F.count("*").alias("n_docs"))
    # Document frequency as a window over tf, not a groupBy+re-join:
    # the join form either re-tokenizes the whole corpus for the
    # second branch (the r3 bench regression — 2x the scan and the
    # big shuffle) or needs tf persisted AND a vocabulary-sized
    # broadcast, which stops being broadcastable at 100 TB corpus
    # scale (vocab ~ 10^8 terms). The window form is one pipeline:
    # tf shuffles by term once for the count, then by doc_id for the
    # top-k — no cache, no broadcast, skew handled by AQE.
    wt = Window.partitionBy("term")
    scored = (
        tf.withColumn("dft", F.count("*").over(wt))
        .crossJoin(n)
        .select(
            "doc_id",
            "term",
            srnd(F.col("tf") * F.log(F.col("n_docs") / F.col("dft")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


# ---------------------------------------------------------------- stratified split

# Per-language keep-rate as an md5-prefix threshold: en 50%, es 25%,
# rest 12.5% (128/256, 64/256, 32/256 of the first hash byte).
_STRATA = {"en": "80", "es": "40"}
_DEFAULT_THRESH = "20"


@query(
    "q_sample_strat",
    oracle=f"""
    SELECT lang,
           count(*) AS n_total,
           count(*) FILTER (
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
               CASE lang WHEN 'en' THEN '{_STRATA["en"]}' WHEN 'es' THEN '{_STRATA["es"]}'
                         ELSE '{_DEFAULT_THRESH}' END
           ) AS n_sampled,
           min(doc_id) FILTER (
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
               CASE lang WHEN 'en' THEN '{_STRATA["en"]}' WHEN 'es' THEN '{_STRATA["es"]}'
                         ELSE '{_DEFAULT_THRESH}' END
           ) AS min_sampled_id
    FROM documents GROUP BY lang
    """,
)
def q_sample_strat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — per-language keep rates via
    content-stable hash thresholds (en 50%, es 25%, other 12.5%).

    Corpus pipelines rebalance language mix this way: the hash
    threshold is a pure row-local predicate (same doc → same split on
    every run and engine, unlike rand()-sampling), so the plan is one
    scan + one partial-agg groupBy(lang) — no extra shuffle, no state,
    and the rates can be tuned per stratum without re-shuffling.
    """
    d = load_table(spark, sf_dir, "documents")
    thresh = F.when(F.col("lang") == "en", _STRATA["en"]).when(
        F.col("lang") == "es", _STRATA["es"]
    ).otherwise(_DEFAULT_THRESH)
    keep = (
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2) < thresh
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(keep, 1)).alias("n_sampled"),
        F.min(F.when(keep, F.col("doc_id"))).alias("min_sampled_id"),
    )


# ---------------------------------------------------------------- sequence packing

_CHUNK_TOKENS = 512


@query(
    "q_pack_chunks",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ), placed AS (
        SELECT source, doc_id, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS start_tok
        FROM sized
    )
    SELECT source,
           CAST(floor(start_tok / {_CHUNK_TOKENS}) AS BIGINT) AS chunk_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM placed GROUP BY source, chunk_id
    """,
)
def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: concatenate each source's documents in
    doc_id order and split the token stream into {_CHUNK_TOKENS}-token
    chunks — the concat-and-chunk sharding LLM pretraining uses. A doc
    is billed to the chunk its first token lands in.

    The running token offset is a window sum PARTITIONED BY source —
    each source packs independently and in parallel, which is how a
    100 TB corpus avoids a global sequential scan: parallelism = number
    of sources (in a real pipeline, source × shard). Integer
    arithmetic throughout, so both engines agree exactly.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.withColumn("start_tok", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        placed.withColumn(
            "chunk_id", F.floor(F.col("start_tok") / F.lit(_CHUNK_TOKENS))
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------- PII redaction

_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"


@query(
    "q_pii_redact",
    oracle=f"""
    WITH seeded AS (
        SELECT lang,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact u' || doc_id || '@example.com'
                    ELSE text END AS txt
        FROM documents
    ), red AS (
        SELECT lang, txt, regexp_replace(txt, '{_EMAIL_RE}', '[EMAIL]') AS clean
        FROM seeded
    )
    SELECT lang,
           count(*) AS n_docs,
           count(*) FILTER (clean <> txt) AS n_redacted,
           CAST(sum(len(txt) - len(clean)) AS BIGINT) AS chars_removed
    FROM red GROUP BY lang
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: scrub email addresses to ``[EMAIL]`` and report
    per-language hit counts. The fixture corpus is PII-free, so every
    7th doc gets a deterministic synthetic address appended (same
    seeding in the oracle).

    regexp_replace is a row-local JVM expression — the redaction pass
    is shuffle-free and whole-stage-codegen'd; the only shuffle is the
    final per-lang rollup. (Dialect note: DuckDB's regexp_replace
    replaces the first match vs Spark's all — identical here because
    seeding plants exactly one address per doc and the corpus has no
    ``@``.)
    """
    d = load_table(spark, sf_dir, "documents")
    txt = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.col("text"))
    seeded = d.select("lang", txt.alias("txt"))
    red = seeded.withColumn("clean", F.regexp_replace("txt", _EMAIL_RE, "[EMAIL]"))
    return red.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("clean") != F.col("txt"), 1)).alias("n_redacted"),
        F.sum(F.length("txt") - F.length("clean")).alias("chars_removed"),
    )


# ---------------------------------------------------------------- contamination

_NGRAM_K = 8


@query(
    "q_contamination",
    oracle=f"""
    WITH corpus AS (
        {_DOCS_TWINS_SQL}
    ), corpus_ng AS (
        SELECT doc_id AS cid, unnest({_duck_shingles(_NGRAM_K)}) AS ng FROM corpus
    ), bench_ng AS (
        SELECT doc_id AS bid, unnest({_duck_shingles(_NGRAM_K)}) AS ng
        FROM documents WHERE doc_id % 13 = 0
    )
    SELECT cid AS doc_id,
           count(DISTINCT bid) AS n_bench_hits,
           count(DISTINCT ng) AS n_shared_ngrams
    FROM corpus_ng JOIN bench_ng USING (ng)
    WHERE cid <> bid
    GROUP BY cid
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screening: which corpus documents share
    an {_NGRAM_K}-gram with a held-out benchmark set (every 13th doc)?
    The standard n-gram-overlap decontamination check run before
    training. Corpus = documents ∪ mutated twins, so each benchmark
    doc's twin is a guaranteed true positive; self-matches excluded.

    Scale shape: both sides explode to (doc, ngram) and meet in an
    equi-join keyed by the ngram string — the benchmark side is tiny
    (thousands of eval docs versus a 100 TB corpus), so Spark
    broadcasts it and the corpus side never shuffles; the per-doc
    rollup is the only exchange.
    """
    corpus = _docs_with_twins(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # r14: n-grams meet as xxhash64 longs, not strings — the broadcast
    # build side shrinks ~6× and the probe compares 8-byte keys; the
    # per-doc countDistinct over hashed grams equals the string count
    # modulo the dedup family's documented ~1e-12 collision odds.
    from cassowary_spark.operators.skew import spread_narrow_input

    # r15: the corpus-side gram explode ran inside a 1-2-task scan
    # stage; spread only when under-parallel (no-op at corpus scale)
    corpus_ng = spread_narrow_input(corpus, "doc_id").select(
        F.col("doc_id").alias("cid"),
        F.explode(shingles_of_tokens("split(text, ' ')", _NGRAM_K)).alias("ng0"),
    ).select("cid", F.xxhash64("ng0").alias("ng"))
    bench_ng = docs.filter(F.col("doc_id") % 13 == 0).select(
        F.col("doc_id").alias("bid"),
        F.explode(shingles_of_tokens("split(text, ' ')", _NGRAM_K)).alias("ng0"),
    ).select("bid", F.xxhash64("ng0").alias("ng"))
    return (
        corpus_ng.join(F.broadcast(bench_ng), "ng")
        .filter(F.col("cid") != F.col("bid"))
        .groupBy(F.col("cid").alias("doc_id"))
        .agg(
            F.countDistinct("bid").alias("n_bench_hits"),
            F.countDistinct("ng").alias("n_shared_ngrams"),
        )
    )


# ---------------------------------------------------------------- gap fill

_GAP_USERS = 8


@query(
    "q_gap_fill",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hr,
               count(*) AS n, {sql_srnd("avg(value)", 4)} AS avg_r
        FROM events WHERE user_id < {_GAP_USERS} GROUP BY user_id, hr
    ), bounds AS (
        SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM hourly GROUP BY user_id
    ), spine AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        FROM bounds
    )
    SELECT s.user_id, s.hr,
           coalesce(h.n, 0) AS n_events,
           last_value(h.avg_r IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS locf_avg
    FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: hourly event counts per user
    with empty hours zero-filled and the mean value carried forward
    (LOCF) — the densification every monitoring/feature pipeline needs
    before windowed models.

    The hour spine is generated per user from that user's own bounds
    (sequence + explode), so spine size is data-driven and the whole
    plan is keyed by user_id — gap-filling 10⁹ users is just more
    partitions. avg is rounded (srnd) BEFORE the LOCF window so both
    engines carry forward identical values.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < _GAP_USERS)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"), srnd(F.avg("value"), 4).alias("avg_r"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    joined = spine.join(hourly, ["user_id", "hr"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hr",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.last("avg_r", ignorenulls=True).over(w).alias("locf_avg"),
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH spend AS (
        SELECT o_custkey AS k,
               floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS spend
        FROM orders GROUP BY o_custkey
    ),
    source AS (
        SELECT k, spend FROM spend
        UNION ALL
        SELECT k + 1000000 AS k, spend FROM spend WHERE k <= 50
    )
    SELECT coalesce(c.c_custkey, s.k)                          AS c_custkey,
           coalesce(c.c_name, 'Customer#new' || CAST(s.k AS VARCHAR)) AS c_name,
           floor((coalesce(c.c_acctbal, 0.0) + coalesce(s.spend, 0.0) * 0.0001) * 10000.0 + 0.5) / 10000.0 AS new_acctbal,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN s.k IS NULL        THEN 'keep'
                ELSE 'update' END                              AS action
    FROM customer c FULL JOIN source s ON c.c_custkey = s.k
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert (Hive's INSERT OVERWRITE-era upsert surface,
    SCD-style): apply a change-set to a dimension — matched rows
    update (balance += spend-derived delta), unmatched source rows
    insert (synthetic new customers), unmatched target rows pass
    through — with an action tag per row.

    Expressed as one full outer join + coalesce projection: exactly
    the plan a v2 MERGE INTO executes (join on the merge key, branch
    per match case), minus the table-format commit. Both sides
    shuffle once on the key; at 100 TB the change-set side is usually
    small → AQE broadcast-converts and the dimension never shuffles.
    The spend delta is rounded BEFORE the add on both engines so the
    update arithmetic is bit-identical.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = o.groupBy(F.col("o_custkey").alias("k")).agg(
        srnd(F.sum("o_totalprice"), 2).alias("spend")
    )
    source = spend.unionByName(
        spend.filter(F.col("k") <= 50).select((F.col("k") + 1000000).alias("k"), "spend")
    )
    merged = c.join(source, c.c_custkey == source.k, "full")
    return merged.select(
        F.coalesce(c.c_custkey, source.k).alias("c_custkey"),
        F.coalesce(
            c.c_name, F.concat(F.lit("Customer#new"), source.k.cast("string"))
        ).alias("c_name"),
        srnd(
            F.coalesce(c.c_acctbal, F.lit(0.0)) + F.coalesce(source.spend, F.lit(0.0)) * 0.0001,
            4,
        ).alias("new_acctbal"),
        F.when(c.c_custkey.isNull(), "insert")
        .when(source.k.isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )


# ---------------------------------------------------------------- SCD2 history


@query(
    "q_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ), changes AS (
        SELECT user_id, event_type, ts AS valid_from, event_id
        FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
               AS valid_to,
           row_number() OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
               AS version
    FROM changes
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history build (C14b): collapse
    each user's event stream into effective-dated versions of their
    current event_type — rows open when the attribute changes and
    close at the next change (valid_to NULL = current version).

    The CDC-to-warehouse pattern C14's MERGE covers for "latest state";
    this keeps full history. Plan: two windows over the SAME
    (user_id)-partitioned, time-ordered sort — Catalyst reuses one
    exchange + sort for the lag, the change filter, the lead, and the
    version number, so the whole history build is a single shuffle of
    the change rows. At 100 TB: user_id is high-cardinality (no hot
    partition), and state never leaves the executor.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )
