"""Round-6 wave 24 (SURVEY.md §2): corpus-dedup and distribution
hygiene — asymmetric shingle-containment pairs (doc-inside-doc),
per-source KL divergence of the language mix, and per-user
time-weighted averages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.operators.dedup import SHINGLE_DF_CAP
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------- C135 asymmetric containment dedup pairs


@query(
    "q_shingle_containment",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               text || ' qq17 zz93 vv41' AS text
        FROM documents
    ),
    sh0 AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 4, 1)
                         + 1),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 4),
                       ' ')))) AS shingle
        FROM docs
    ),
    sh AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   count(*) OVER (PARTITION BY shingle) AS df
            FROM sh0
        ) WHERE df <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT CASE WHEN sa.n < sb.n
                     OR (sa.n = sb.n AND id_a < id_b)
                    THEN id_a ELSE id_b END AS contained_id,
               CASE WHEN sa.n < sb.n
                     OR (sa.n = sb.n AND id_a < id_b)
                    THEN id_b ELSE id_a END AS container_id,
               CAST(n_inter AS DOUBLE)
                   / CAST(least(sa.n, sb.n) AS DOUBLE) AS c
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT contained_id, container_id,
           floor(c * 1000000.0 + 0.5) / 1000000.0 AS containment
    FROM scored WHERE c >= 0.9
    """,
)
def q_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (C135): pairs where the smaller
    document's 5-shingle set is ≥90% contained in the larger's —
    the doc-inside-doc case (full quotation, boilerplate wrapping,
    article + appended footer) that symmetric Jaccard (C2/C68)
    structurally misses: a short doc quoted inside a long one has
    Jaccard ≈ |A|/|B| ≈ 0 but containment ≈ 1. Run over the corpus ∪
    a suffix-extended twin of every doc — each twin CONTAINS its
    original exactly (appending tokens only adds shingle windows),
    so the expected pair set is the identity mapping at containment
    1.0 plus any organic containments.

    Determinism: shingle sets are per-doc-distinct; intersection and
    size counts are exact integers; the quotient is one fixed
    division srnd-quantized (the oracle spells the same floor form
    inline); the contained/container orientation is (size, id)-
    tiebroken.

    Scale shape (r12 re-authoring, r13 cap value): identical to C68's
    shingle equi-join — disjoint docs never meet — and carries the
    SAME production posture as q_dedup_ngram on BOTH engine and
    oracle: selective 5-gram shingles plus the SHINGLE_DF_CAP
    stop-shingle cap (containment is computed over the RETAINED
    shingle space; the planted twins stay at exactly 1.0 because a
    twin retains every shingle its original retains — the df cap
    drops a shingle from BOTH or NEITHER member of a twin pair, as
    twin shingles are supersets). The former exact-uncapped 3-gram
    form made the oracle's pair join explode super-linearly in corpus
    size (>240 s in DuckDB at sf1 — the last sf1-parity skip); the
    r12 cap of 1000 still measured α=+1.85 across sf1→sf10 (df-cap
    transition regime, BASELINE.md), so r13 lowered the shared knob
    to SHINGLE_DF_CAP=128 (operators/dedup.py).
    """
    from cassowary_spark.operators.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twin = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq17 zz93 vv41")).alias("text"),
    )
    corpus = d.unionByName(twin)
    pairs = containment_pairs(
        corpus, "doc_id", "text", shingle_k=5, threshold=0.9,
        max_shingle_df=SHINGLE_DF_CAP,
    )
    return pairs.select(
        "contained_id",
        "container_id",
        srnd(F.col("containment"), 6).alias("containment"),
    )


# ------------------- C136 per-source KL divergence of language mix


@query(
    "q_kl_divergence",
    oracle=f"""
    WITH cell AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    per_src AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs
                FROM cell GROUP BY 1),
    per_lang AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl
                 FROM cell GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cell),
    terms AS (
        SELECT source, lang, cs,
               {sql_srnd(
                   "CAST(c AS DOUBLE) / CAST(cs AS DOUBLE)"
                   " * ln(CAST(c AS DOUBLE) * CAST(nn AS DOUBLE)"
                   "      / (CAST(cs AS DOUBLE) * CAST(cl AS DOUBLE)))",
                   8)} AS term
        FROM cell JOIN per_src USING (source)
        JOIN per_lang USING (lang) CROSS JOIN tot
    )
    SELECT source, CAST(max(cs) AS BIGINT) AS n_docs,
           {sql_srnd("list_sum(list(term ORDER BY lang))", 6)} AS kl_nats
    FROM terms GROUP BY 1
    """,
)
def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the language mix (C136):
    KL(P_source ‖ Q_corpus) = Σ_lang p·ln(p/q) — how far each
    source's language distribution sits from the corpus-wide mix, in
    nats. The distribution-hygiene screen a multi-source pretraining
    pipeline runs per ingest batch (a source whose KL jumps has
    changed its content mix), completing the information-theoretic
    battery: C69 entropy, C131 MI, and now relative entropy.
    Absent (source, lang) cells contribute 0 (the p·ln p convention
    as p→0), and every q is positive because Q is the marginal of
    the same table — no smoothing needed.

    Determinism: all probabilities are ratios of exact BIGINT
    counts; each of the ≤5 terms per source is one fixed IEEE
    sequence ending in one ln, srnd8-quantized before the bounded
    sum (the C69 fold).

    Scale shape: ONE (source × lang)-bounded partial agg (persisted;
    both marginals and the term join reuse it), then arithmetic over
    ≤100 cells. The corpus is scanned once.
    """
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("c")
    )
    # r14: marginals + the per-source KL folds run row-locally over
    # the packed ≤100-cell array in ONE 1-row aggregate, then the
    # per-source rows explode back out (was: persisted cell frame
    # fanning into 3 marginal jobs + a 3-way join). Each source's
    # srnd8-quantized terms still fold in LANG order (the C69 idiom —
    # the filtered slice of the sorted array preserves it); a plain
    # sum()'s engine-dependent fold order flips the srnd6 boundary
    # at sf0.1 (caught by the round-7 parity sweep).
    packed = cell.agg(
        F.expr("array_sort(collect_list(struct(source, lang, c)))").alias(
            "cls"
        )
    ).select(
        "cls",
        F.expr("aggregate(cls, 0L, (a, x) -> a + x.c)").alias("nn"),
        F.expr("array_sort(array_distinct(transform(cls, x -> x.source)))")
        .alias("srcs"),
    )
    ex = packed.select("cls", "nn", F.explode("srcs").alias("source"))
    cl = (
        "CAST(aggregate(filter(cls, y -> y.lang = x.lang), 0L,"
        " (al, yl) -> al + yl.c) AS DOUBLE)"
    )
    term = (
        "floor((CAST(x.c AS DOUBLE) / CAST(cst AS DOUBLE)"
        " * ln(CAST(x.c AS DOUBLE) * CAST(nn AS DOUBLE)"
        f" / (CAST(cst AS DOUBLE) * {cl}))) * 1.0E8 + 0.5) / 1.0E8"
    )
    kl = ex.select(
        "source",
        F.expr(
            "transform(array(filter(cls, cf -> cf.source = source)), sl ->"
            " transform(array(aggregate(sl, 0L, (a0, x0) -> a0 + x0.c)),"
            " cst -> struct(cst AS nd,"
            " aggregate(sl, CAST(0.0 AS DOUBLE), (acc, x) ->"
            f" acc + {term}) AS kl))[0])[0]"
        ).alias("s"),
    )
    return kl.select(
        "source",
        F.col("s.nd").cast("long").alias("n_docs"),
        srnd(F.col("s.kl"), 6).alias("kl_nats"),
    )


# ----------------------------- C137 per-user time-weighted average


@query(
    "q_time_weighted_avg",
    oracle=f"""
    WITH ev AS (
        SELECT user_id,
               epoch_us(date_trunc('microseconds', ts)) AS t_us,
               event_id,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents
        FROM events
    ),
    stepped AS (
        SELECT user_id, v_cents,
               lead(t_us) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id) - t_us AS dt
        FROM ev
    ),
    agg AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN dt IS NOT NULL THEN v_cents * dt END)
                    AS BIGINT) AS swx,
               CAST(sum(dt) AS BIGINT) AS st
        FROM stepped GROUP BY 1
    )
    SELECT user_id, n_events,
           {sql_srnd(
               "CAST(swx AS DOUBLE) / CAST(nullif(st, 0) AS DOUBLE)"
               " / 100.0", 6)} AS twap
    FROM agg
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average (C137): TWAP of the event value
    — each value weighted by how long it REMAINED CURRENT (until the
    user's next event), i.e. the integral of the user's value step
    function over their active span divided by that span. The right
    mean for sampled state (price quotes, sensor readings, account
    balances) where B17's row-mean over-weights bursts of rapid
    updates. Single-event users (no holding interval) and zero-span
    users are NULL by guard.

    Determinism: timestamps are exact epoch-MICROSECOND integers on
    both engines (DuckDB date_truncs its ns read to µs, matching
    Spark's scan-time truncation); values are exact cents; Σv·Δt is
    an exact BIGINT per user (documented headroom: 30-day span ×
    2e4 cents × per-user events ≈ 5e16 ≪ 2^63); the (ts, event_id)
    sort key is unambiguous.

    Scale shape: ONE user-keyed window pass (lead) feeding a partial
    agg on the SAME key — no second shuffle; output cardinality is
    the user dimension. The canonical "state-duration analytics in
    one pass over the event log" shape (C113's time-in-state is the
    categorical sibling).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("t_us"),
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("v_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    stepped = ev.select(
        "user_id",
        "v_cents",
        (F.lead("t_us").over(w) - F.col("t_us")).alias("dt"),
    )
    agg = stepped.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(
            F.when(
                F.col("dt").isNotNull(), F.col("v_cents") * F.col("dt")
            )
        )
        .cast("long")
        .alias("swx"),
        F.sum("dt").cast("long").alias("st"),
    )
    return agg.select(
        "user_id",
        "n_events",
        srnd(
            F.col("swx").cast("double")
            / F.nullif(F.col("st"), F.lit(0)).cast("double")
            / 100.0,
            6,
        ).alias("twap"),
    )
