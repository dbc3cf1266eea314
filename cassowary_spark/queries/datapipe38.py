"""Round-9 wave 40 (SURVEY.md §2): rank correlation (Spearman, C168),
symmetric distribution distance (Jensen-Shannon, C169), embedding
dimension health (dead-dim variance profile, C170), off-policy value
estimation (inverse-propensity scoring, C171), per-source exact-dup
audit (C172), and CCNet-style perplexity bucketing (C173).

All six follow the established determinism contract: exact integer
accumulation wherever a sum is unordered, srnd quantization BEFORE any
compare/rank on a float, and fixed-order (C69) folds for any sum over
already-quantized float terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.operators.ranks import attach_doubled_midranks
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------ C168 Spearman rank correlation

# n_tokens proxy: spaces + 1 — pure string arithmetic, identical on
# both engines (no regex dialect risk), monotone enough in the real
# token count for a rank statistic.
_SP_NTOK = "length(text) - length(replace(text, ' ', '')) + 1"


@query(
    "q_spearman_corr",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, lang,
               CAST(n_chars AS BIGINT) AS x,
               CAST({_SP_NTOK} AS BIGINT) AS y
        FROM documents
    ),
    r AS (
        SELECT lang,
               2 * rank() OVER (PARTITION BY lang ORDER BY x)
                 + count(*) OVER (PARTITION BY lang, x) - 1 AS u,
               2 * rank() OVER (PARTITION BY lang ORDER BY y)
                 + count(*) OVER (PARTITION BY lang, y) - 1 AS v
        FROM m
    ),
    s AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(u) AS BIGINT) AS su,
               CAST(sum(v) AS BIGINT) AS sv,
               CAST(sum(u * v) AS BIGINT) AS suv,
               CAST(sum(u * u) AS BIGINT) AS suu,
               CAST(sum(v * v) AS BIGINT) AS svv
        FROM r GROUP BY lang
    )
    SELECT lang, n,
           {sql_srnd(
               "(CAST(n AS DOUBLE) * CAST(suv AS DOUBLE)"
               " - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE))"
               " / nullif(sqrt(CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)"
               "               - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))"
               "          * sqrt(CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)"
               "                 - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)),"
               " 0.0)",
               6)} AS spearman_rho
    FROM s
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (C168): per-language ρ between
    document length in chars and the whitespace token count — the
    nonparametric monotone-association screen (does length track
    token count the same way in every language, or is one lang's
    content structurally different?). Completes the association
    battery: Pearson-style slopes (C140 Theil-Sen is the robust
    line), χ²/Cramér's V (categorical), MI (C131), and now a
    rank-based coefficient robust to any monotone transform.

    Determinism: ties get AVERAGE ranks via the exact integer
    identity 2·ar = 2·min_rank + tie_count − 1, computed from
    per-(lang, value) COUNTS (operators/ranks.doubled_midranks —
    value-determined, so row order can't move it), and ρ is Pearson
    over those integer doubled-ranks: every sum is Σ cnt·f(u, v)
    over the joint (lang, x, y) cell frame — five exact BIGINT sums
    per lang, bit-identical to ranking the rows, then ONE fixed
    float expression per group, srnd6-quantized. No float
    accumulates anywhere.

    Scale shape: NO per-lang corpus sort — one map-side-combining
    groupBy(lang, x, y) collapses documents to its joint cell frame
    (both metrics are domain-bounded integers: char counts, token
    counts), then two join-free VALUE-framed running sums
    (operators/ranks.attach_doubled_midranks: rangeBetween pools the
    cumulative count across the other key at the same value) attach
    (u, v) directly to each cell for the per-lang sums. The two
    windows run over the domain-bounded cell frame; the whale lang
    costs a bigger cell frame, never a sort. This IS the 100 TB
    shape; the former per-lang row-ranked windows are gone (r9
    verdict ask).
    """
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("y"),
    )
    cells = m.groupBy("lang", "x", "y").agg(
        F.count("*").cast("long").alias("cnt")
    )
    j = attach_doubled_midranks(
        attach_doubled_midranks(
            cells, "x", "cnt", group_cols=("lang",), out_col="u"
        ),
        "y",
        "cnt",
        group_cols=("lang",),
        out_col="v",
    )
    s = j.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("u")).cast("long").alias("su"),
        F.sum(F.col("cnt") * F.col("v")).cast("long").alias("sv"),
        F.sum(F.col("cnt") * F.col("u") * F.col("v")).cast("long").alias("suv"),
        F.sum(F.col("cnt") * F.col("u") * F.col("u")).cast("long").alias("suu"),
        F.sum(F.col("cnt") * F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    num = F.col("n").cast("double") * F.col("suv").cast("double") - F.col(
        "su"
    ).cast("double") * F.col("sv").cast("double")
    den = F.sqrt(
        F.col("n").cast("double") * F.col("suu").cast("double")
        - F.col("su").cast("double") * F.col("su").cast("double")
    ) * F.sqrt(
        F.col("n").cast("double") * F.col("svv").cast("double")
        - F.col("sv").cast("double") * F.col("sv").cast("double")
    )
    return s.select(
        "lang",
        "n",
        srnd(num / F.nullif(den, F.lit(0.0)), 6).alias("spearman_rho"),
    )


# --------------------------- C169 Jensen-Shannon divergence by source


@query(
    "q_js_divergence",
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
    grid AS (
        SELECT s.source, s.cs, l.lang, l.cl, coalesce(cell.c, 0) AS c
        FROM per_src s CROSS JOIN per_lang l
        LEFT JOIN cell ON cell.source = s.source AND cell.lang = l.lang
    ),
    terms AS (
        SELECT source, lang, cs,
               {sql_srnd(
                   "0.5 * (CASE WHEN c > 0 THEN"
                   "  CAST(c AS DOUBLE) / CAST(cs AS DOUBLE)"
                   "  * ln((CAST(c AS DOUBLE) / CAST(cs AS DOUBLE))"
                   "       / (0.5 * (CAST(c AS DOUBLE) / CAST(cs AS DOUBLE)"
                   "                 + CAST(cl AS DOUBLE) / CAST(nn AS DOUBLE))))"
                   " ELSE 0.0 END"
                   " + CAST(cl AS DOUBLE) / CAST(nn AS DOUBLE)"
                   "  * ln((CAST(cl AS DOUBLE) / CAST(nn AS DOUBLE))"
                   "       / (0.5 * (CAST(c AS DOUBLE) / CAST(cs AS DOUBLE)"
                   "                 + CAST(cl AS DOUBLE) / CAST(nn AS DOUBLE)))))",
                   8)} AS term
        FROM grid CROSS JOIN tot
    )
    SELECT source, CAST(max(cs) AS BIGINT) AS n_docs,
           {sql_srnd("list_sum(list(term ORDER BY lang))", 6)} AS js_nats
    FROM terms GROUP BY 1
    """,
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of the language mix (C169):
    JSD(P_source ‖ Q_corpus) = ½·KL(P‖M) + ½·KL(Q‖M) with
    M = (P+Q)/2 — the SYMMETRIC, bounded (≤ ln 2) companion to
    C136's KL, and the metric of choice when neither distribution
    is the privileged "truth" (cross-source corpus comparisons,
    tokenizer-mix drift dashboards; √JSD is a true metric).

    Unlike KL, the q-side term q·ln(q/m) contributes even where the
    source has ZERO docs in a language (m = q/2 → the term is
    q·ln 2), so the term grid is the FULL |sources|×|langs| cross of
    the marginals with absent cells coalesced to c = 0 — both
    engines materialize identical grids; the p-side term takes the
    p→0 limit (0) on those cells.

    Determinism: every probability is a ratio of exact BIGINT
    counts; each grid cell's term is one fixed IEEE sequence
    srnd8-quantized, and the per-source sum is the C69 fixed-order
    fold over lang. Scale shape: one (source × lang)-bounded partial
    agg reused by both marginals (persisted); the grid is
    marginal-sized (≤ a few hundred rows at any corpus size), so
    everything after the single corpus scan is arithmetic on tiny
    broadcast frames.
    """
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("c")
    )
    # r14: marginals, the full source×lang term grid (absent cells
    # c = 0 — iterating the complete sorted LANGS array per source
    # materializes the same grid both engines see) and the per-source
    # JSD folds run row-locally over the packed ≤100-cell array in
    # ONE 1-row aggregate, then the per-source rows explode back
    # (was: persisted cell frame + 3 marginal jobs + grid join).
    # Each source's srnd8 terms still fold in LANG order (C69 — the
    # sorted langs array IS the old struct-sort order).
    packed = cell.agg(
        F.expr("array_sort(collect_list(struct(source, lang, c)))").alias(
            "cls"
        )
    ).select(
        "cls",
        F.expr("aggregate(cls, 0L, (a, x) -> a + x.c)").alias("nn"),
        F.expr("array_sort(array_distinct(transform(cls, x -> x.source)))")
        .alias("srcs"),
        F.expr("array_sort(array_distinct(transform(cls, x -> x.lang)))")
        .alias("langs"),
    )
    ex = packed.select(
        "cls", "nn", "langs", F.explode("srcs").alias("source")
    )
    c_ = (
        "CAST(aggregate(filter(sl, y -> y.lang = l), 0L,"
        " (ac, yc) -> ac + yc.c) AS BIGINT)"
    )
    cl_ = (
        "CAST(aggregate(filter(cls, z -> z.lang = l), 0L,"
        " (al, zl) -> al + zl.c) AS DOUBLE)"
    )
    p = "(CAST(c0 AS DOUBLE) / CAST(cst AS DOUBLE))"
    q = f"({cl_} / CAST(nn AS DOUBLE))"
    m = f"(0.5 * ({p} + {q}))"
    term = (
        "floor((0.5 * (CASE WHEN c0 > 0"
        f" THEN {p} * ln({p} / {m}) ELSE CAST(0.0 AS DOUBLE) END"
        f" + {q} * ln({q} / {m}))) * 1.0E8 + 0.5) / 1.0E8"
    )
    js = ex.select(
        "source",
        F.expr(
            "transform(array(filter(cls, cf -> cf.source = source)), sl ->"
            " transform(array(aggregate(sl, 0L, (a0, x0) -> a0 + x0.c)),"
            " cst -> struct(cst AS nd,"
            " aggregate(langs, CAST(0.0 AS DOUBLE), (acc, l) ->"
            f" acc + aggregate(array({c_}), CAST(0.0 AS DOUBLE),"
            f" (a9, c0) -> a9 + {term})) AS js))[0])[0]"
        ).alias("s"),
    )
    return js.select(
        "source",
        F.col("s.nd").cast("long").alias("n_docs"),
        srnd(F.col("s.js"), 6).alias("js_nats"),
    )


# ------------------------------- C170 embedding dimension variance

_DV_Q = 1_000_000.0  # micro-unit quantization (C157's idiom)
_DV_DEAD = 1e-4  # variance floor below which a dimension is "dead"
# Oracle fragments precomputed so the f-string stays flat
_DV_MEAN_SQL = f"CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * {_DV_Q})"
_DV_VAR_SQL = (
    f"CAST(sqq AS DOUBLE) / (CAST(n AS DOUBLE) * {_DV_Q} * {_DV_Q})"
    f" - ({_DV_MEAN_SQL}) * ({_DV_MEAN_SQL})"
)


@query(
    "q_dim_variance",
    oracle=f"""
    WITH comp AS (
        SELECT i AS dim,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * {_DV_Q} + 0.5)
                    AS BIGINT) AS q
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)
    ),
    s AS (
        SELECT dim, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS sq,
               CAST(sum(q * q) AS BIGINT) AS sqq
        FROM comp GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim, n,
           {sql_srnd(_DV_MEAN_SQL, 6)} AS mean,
           {sql_srnd(_DV_VAR_SQL, 8)} AS variance,
           CAST(CASE WHEN {sql_srnd(_DV_VAR_SQL, 8)} < {_DV_DEAD}
               THEN 1 ELSE 0 END AS INT) AS is_dead
    FROM s
    """,
)
def q_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding dimension health (C170): per-dimension mean and
    population variance across the whole embedding table, with a
    dead-dimension flag (variance < 1e-4) — the model-ops audit that
    catches collapsed/unused dimensions after a bad training run or
    a truncation bug (complements C150 matryoshka truncation and
    C66's norm QA, which look at rows; this looks at columns).

    Determinism: components quantize to integer micro-units BEFORE
    any sum (the C157 idiom), so Σq and Σq² are exact BIGINTs under
    any partitioning; mean/variance are then single fixed float
    expressions per dimension — variance is srnd8-quantized and the
    dead flag compares the QUANTIZED value, so a 1-ulp difference
    cannot flip the flag.

    Scale shape: posexplode to (dim, q) pairs that partial-agg
    map-side down to |dims| rows before the one shuffle — the
    classic column-profile reduction; no joins, corpus scanned once.
    """
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        F.posexplode("embedding").alias("dim0", "x")
    ).select(
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * _DV_Q + 0.5)
        .cast("long")
        .alias("q"),
    )
    s = comp.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    mean = F.col("sq").cast("double") / (F.col("n").cast("double") * _DV_Q)
    var = srnd(
        F.col("sqq").cast("double") / (F.col("n").cast("double") * _DV_Q * _DV_Q)
        - mean * mean,
        8,
    )
    return s.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        srnd(mean, 6).alias("mean"),
        var.alias("variance"),
        F.when(var < _DV_DEAD, 1).otherwise(0).cast("int").alias("is_dead"),
    )


# --------------------------- C171 inverse-propensity policy estimate


@query(
    "q_ips_estimate",
    oracle=f"""
    WITH acts AS (
        SELECT event_type, CAST(cnt AS BIGINT) AS c,
               CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS idx,
               CAST(count(*) OVER () AS BIGINT) AS k
        FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1) g
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM acts),
    matched AS (
        SELECT e.event_type,
               CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS r_cents
        FROM events e JOIN acts a ON a.event_type = e.event_type
        WHERE 1 + (CAST('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % a.k) = a.idx
    ),
    per AS (
        SELECT a.event_type, a.c,
               CAST(coalesce(sum(m.r_cents), 0) AS BIGINT) AS s_cents,
               CAST(count(m.event_type) AS BIGINT) AS n_match
        FROM acts a LEFT JOIN matched m ON m.event_type = a.event_type
        GROUP BY a.event_type, a.c
    ),
    folded AS (
        SELECT CAST(sum(n_match) AS BIGINT) AS n_matched,
               list_sum(list(
                   {sql_srnd(
                       "CAST(s_cents AS DOUBLE)"
                       " / (100.0 * CAST(c AS DOUBLE))", 8)}
                   ORDER BY event_type)) AS v
        FROM per
    )
    SELECT (SELECT nn FROM tot) AS n_events, n_matched,
           {sql_srnd("v", 6)} AS ips_value
    FROM folded
    """,
)
def q_ips_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity off-policy estimate (C171): the value of a
    deterministic target policy π (each user is assigned one action
    by hashing their id over the action vocabulary) evaluated from
    LOGGED events only — V̂_IPS = (1/N)·Σ 1{a_i = π(u_i)}·r_i/p̂(a_i)
    with the logging propensity p̂(a) taken as the empirical action
    frequency. The counterfactual-evaluation primitive behind every
    "would the new ranking policy have done better" question asked
    of interaction logs (reward = event value in cents).

    The estimator reduces exactly: (1/N)·(N/c_a) = 1/c_a, so
    V̂ = Σ_a S_a/(100·c_a) where S_a is the matched-reward cents sum
    for action a — each S_a an exact BIGINT, each term one division
    srnd8-quantized, and the ≤|actions| terms folded in action order
    (the C69 idiom). The policy hash is the established md5-hex-u32
    (identical in both engines); matching is a row-local predicate.

    Scale shape: the action frame (propensities + policy indices) is
    a |actions|-row broadcast; the log is scanned ONCE with the
    match predicate evaluated row-local, then partial-aggs to
    |actions| rows. No corpus-sized shuffle at all.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    # r14: the action frame packs into ONE sorted array (its position
    # IS the old row_number idx, its size the old k — both windows
    # and the persist go away); the policy match evaluates against
    # the broadcast 1-row array, and the whole per-action tail
    # (left-join coalesce + term fold + totals) runs row-locally
    # over the two tiny arrays. The srnd8 terms still fold in action
    # order (C69 — the sorted array order).
    acts = (
        ev.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("c"))
        .agg(
            F.expr(
                "array_sort(collect_list(struct(event_type, c)))"
            ).alias("acts")
        )
        .select(
            "acts",
            F.expr("CAST(size(acts) AS BIGINT)").alias("k"),
            F.expr("aggregate(acts, 0L, (a, x) -> a + x.c)").alias("nn"),
        )
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    matched = (
        ev.crossJoin(F.broadcast(acts))
        .withColumn("u32", u32)
        .filter(
            F.col("event_type")
            == F.expr(
                "element_at(acts, CAST(1 + pmod(u32, k) AS INT)).event_type"
            )
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
            .cast("long")
            .alias("s_cents"),
            F.count("*").cast("long").alias("n_match"),
        )
    )
    term = (
        "floor((CAST(sc AS DOUBLE) / (100.0 * CAST(x.c AS DOUBLE)))"
        " * 1.0E8 + 0.5) / 1.0E8"
    )
    sc = (
        "aggregate(filter(ms, y -> y.event_type = x.event_type), 0L,"
        " (am, ym) -> am + ym.s_cents)"
    )
    folded = (
        matched.agg(
            F.expr(
                "array_sort(collect_list(struct(event_type, s_cents,"
                " n_match)))"
            ).alias("ms")
        )
        .crossJoin(F.broadcast(acts))
        .select(
            F.col("nn").alias("n_events"),
            F.expr("aggregate(ms, 0L, (a, x) -> a + x.n_match)").alias(
                "n_matched"
            ),
            srnd(
                F.expr(
                    "aggregate(acts, CAST(0.0 AS DOUBLE), (acc, x) ->"
                    f" acc + aggregate(array({sc}), CAST(0.0 AS DOUBLE),"
                    f" (a9, sc) -> a9 + {term}))"
                ),
                6,
            ).alias("ips_value"),
        )
    )
    return folded


# ------------------------------- C172 per-source exact-dup rate audit


@query(
    "q_dup_rate_by_source",
    oracle=f"""
    WITH h AS (
        SELECT source, md5(text) AS hh FROM documents
    ),
    marked AS (
        SELECT source,
               CASE WHEN count(*) OVER (PARTITION BY hh) > 1
                    THEN 1 ELSE 0 END AS is_dup
        FROM h
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
           {sql_srnd(
               "CAST(sum(is_dup) AS DOUBLE) / CAST(count(*) AS DOUBLE)",
               6)} AS dup_rate
    FROM marked GROUP BY source
    """,
)
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate (C172): for each source, the
    count and share of documents whose exact text occurs more than
    once ANYWHERE in the corpus — the ingest-quality audit that
    attributes duplication to its origin (C6's dedup removes dups;
    this says WHO ships them, the number a crawl operator acts on).
    Cross-source duplicates count against every source holding a
    copy, by design — a mirror site and its origin both get flagged.

    Determinism: membership is an exact md5-equality property (no
    thresholds), counts are integers, the one ratio divides exact
    BIGINTs and srnd6-quantizes.

    Scale shape: ONE hash-keyed shuffle (the window count over
    md5(text) groups — hashes, never text, move) followed by a
    map-side-combining groupBy on source. At 100 TB the hash frame
    is the dedup family's standard working set; no joins.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("hh")
    )
    marked = d.select(
        "source",
        F.when(
            F.count("*").over(Window.partitionBy("hh")) > 1, 1
        ).otherwise(0).alias("is_dup"),
    )
    return marked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dup_docs"),
        srnd(
            F.sum("is_dup").cast("double") / F.count("*").cast("double"), 6
        ).alias("dup_rate"),
    )


# ------------------------------ C173 perplexity buckets (CCNet-style)

_PB_N = 3  # head / middle / tail


@query(
    "q_perplexity_buckets",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    sc AS (
        SELECT doc_id, tf,
               sum(tf) OVER (PARTITION BY term) AS cnt_t,
               sum(tf) OVER () AS tot
        FROM tf
    ),
    lp AS (
        SELECT doc_id,
               {sql_srnd(
                   "ln(sum(tf * cnt_t) / (sum(tf) * max(tot)))", 6)} AS lp
        FROM sc GROUP BY doc_id
    ),
    cells AS (
        SELECT lp.lp AS lp, d.lang, CAST(count(*) AS BIGINT) AS cnt
        FROM lp JOIN documents d ON d.doc_id = lp.doc_id
        GROUP BY 1, 2
    ),
    cut AS (
        SELECT lang, lp, cnt,
               CAST(1 + ((CAST(sum(cnt) OVER (ORDER BY lp DESC
                               RANGE BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) - 1)
                         * {_PB_N})
                    // CAST(sum(cnt) OVER () AS BIGINT)
                    AS INT) AS bucket
        FROM cells
    )
    SELECT lang, bucket,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           {sql_srnd("min(lp)", 6)} AS lp_min,
           {sql_srnd("max(lp)", 6)} AS lp_max
    FROM cut GROUP BY lang, bucket
    """,
)
def q_perplexity_buckets(
    spark: SparkSession, sf_dir: str, *, approx: bool = False
) -> DataFrame:
    """CCNet-style perplexity bucketing (C173): score every document
    with C29's unigram-LM log-probability, cut the corpus into
    head/middle/tail terciles by score (bucket 1 = most
    stereotypical text, 3 = rarest), and report each language's doc
    count and score range per bucket — the curriculum/quality
    banding a pretraining pipeline uses to mix "clean" head data
    with harder tail data at controlled ratios.

    Semantics (r11 re-authoring): the tercile cut is TIES-TOGETHER
    (operators/ranks.counts_bands over the (lp, lang) score cells,
    lp DESC) — documents with identical quality scores always share a
    bucket, which is what a curriculum mixer wants (a score threshold
    either includes a score class or it doesn't). Tie-invariant: no
    doc_id tiebreak, the banding is a pure function of the score
    multiset.

    Determinism: the per-doc score is C29's single-ln construction
    (exact integer accumulation, one float op, srnd6-quantized);
    banding arithmetic is exact BIGINT on both engines; min/max per
    bucket are order-free over quantized values.

    Scale shape: the scoring pass is C29's term-keyed shuffle + doc
    partial agg (corpus-parallel); ONE groupBy then collapses to
    (lp, lang) cells — lp is srnd6-quantized over a bounded score
    range, so the cell frame is domain-bounded (≤ ~10⁷ rows at ANY
    corpus size) and the banding window runs over it only
    (sp_corpus_windows = 0); the report is a ≤ |langs|×3-row agg. No
    corpus sort anywhere — this exact form IS the 100 TB form.
    ``approx=True`` keeps the sketch-threshold variant
    (operators/quantiles.with_approx_ntiles, zero windows of any
    kind); tests/test_ranks.py pins the agreement.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tot = tf.agg(F.sum("tf").alias("__tot"))
    wt = Window.partitionBy("term")
    sc = tf.withColumn("cnt_t", F.sum("tf").over(wt)).crossJoin(
        F.broadcast(tot)
    )
    lp = sc.groupBy("doc_id").agg(
        srnd(
            F.log(
                F.sum(F.col("tf") * F.col("cnt_t"))
                / (F.sum("tf") * F.max("__tot"))
            ),
            6,
        ).alias("lp")
    )
    joined = lp.join(d.select("doc_id", "lang"), "doc_id")
    if approx:
        from cassowary_spark.operators.quantiles import with_approx_ntiles

        # lp ranks DESC in the exact form (bucket 1 = most
        # stereotypical = highest lp), so the ascending approx
        # metric is the negation
        cut = with_approx_ntiles(joined, [("bucket", -F.col("lp"), _PB_N)]).select(
            "lang", "bucket", "lp"
        )
        return cut.groupBy("lang", "bucket").agg(
            F.count("*").cast("long").alias("n_docs"),
            srnd(F.min("lp"), 6).alias("lp_min"),
            srnd(F.max("lp"), 6).alias("lp_max"),
        )
    from cassowary_spark.operators.ranks import counts_bands

    cells = joined.groupBy("lp", "lang").agg(
        F.count("*").cast("long").alias("cnt")
    )
    cut = counts_bands(
        cells, "lp", "cnt", _PB_N, descending=True, out_col="bucket"
    )
    return cut.groupBy("lang", "bucket").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        srnd(F.min("lp"), 6).alias("lp_min"),
        srnd(F.max("lp"), 6).alias("lp_max"),
    )
