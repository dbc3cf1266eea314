"""Round-12 wave 68 (SURVEY.md §2): corpus-statistics finishers —
Dunning log-likelihood-ratio collocations (C241), a Heaps'-law
vocabulary-growth fit (C242), a lognormal document-length fit (C243)
and per-user behavioral entropy (C244).

C241 is the statistically-grounded sibling of C34's PMI (LLR does not
over-reward rare pairs — the reason Dunning 1993 displaced PMI for
collocation mining); C242 quantifies how vocabulary scales with
corpus size (the planning number behind every tokenizer/vocab-size
decision, and the growth-curve view of C223's Chao1 point estimate);
C243 fits the canonical heavy-tailed length model the C41 length
bands discretize; C244 is the per-entity diversity score that C183's
transition entropy aggregates globally.

Same determinism discipline as waves 66-67: exact integer counts,
micro-unit quantization before any float accumulation (ln values in
1e-9 units — the C208 integer-accumulation idiom), C69 ordered folds
for small float sums, srnd on magnitude-stable quantities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# -------------------------------- C241 log-likelihood collocations

_LLR_MIN_COUNT = 5
_LLR_TOPK = 50


@query(
    "q_colloc_llr",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    big AS (
        SELECT unnest(list_transform(
                   range(1, greatest(len(ts) - 1, 0) + 1),
                   i -> struct_pack(w1 := ts[i], w2 := ts[i + 1])
               )) AS b
        FROM toks
    ),
    cells AS (
        SELECT b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS k11
        FROM big GROUP BY 1, 2
    ),
    marg AS (
        SELECT w1, w2, k11,
               CAST(sum(k11) OVER (PARTITION BY w1) AS BIGINT) AS r,
               CAST(sum(k11) OVER (PARTITION BY w2) AS BIGINT) AS c,
               CAST(sum(k11) OVER () AS BIGINT) AS n
        FROM cells
    ),
    scored AS (
        SELECT w1, w2, k11,
            {sql_srnd(
                "2.0 * ("
                "  CAST(k11 AS DOUBLE)"
                "    * ln(CAST(k11 AS DOUBLE) * n"
                "         / (CAST(r AS DOUBLE) * c))"
                "+ CASE WHEN r - k11 > 0 THEN CAST(r - k11 AS DOUBLE)"
                "    * ln(CAST(r - k11 AS DOUBLE) * n"
                "         / (CAST(r AS DOUBLE) * (n - c))) ELSE 0.0 END"
                "+ CASE WHEN c - k11 > 0 THEN CAST(c - k11 AS DOUBLE)"
                "    * ln(CAST(c - k11 AS DOUBLE) * n"
                "         / (CAST(n - r AS DOUBLE) * c)) ELSE 0.0 END"
                "+ CASE WHEN n - r - c + k11 > 0"
                "    THEN CAST(n - r - c + k11 AS DOUBLE)"
                "    * ln(CAST(n - r - c + k11 AS DOUBLE) * n"
                "         / (CAST(n - r AS DOUBLE) * (n - c)))"
                "    ELSE 0.0 END)", 4
            )} AS llr
        FROM marg WHERE k11 >= {_LLR_MIN_COUNT}
    )
    SELECT w1, w2, k11, llr FROM scored
    ORDER BY llr DESC, w1, w2 LIMIT {_LLR_TOPK}
    """,
)
def q_colloc_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio collocations (C241): top-{k}
    adjacent bigrams by the 2×2 LLR G-statistic — the collocation
    score that, unlike C34's PMI, does not explode for rare pairs
    (LLR weights evidence by COUNT, PMI by ratio alone), which is why
    it is the standard for phrase mining on large corpora.

    The 2×2 table per bigram (w1w2 / w1¬w2 / ¬w1w2 / ¬w1¬w2) derives
    ENTIRELY from the bigram counts frame: row marginal = w1's count
    as a first word, column marginal = w2's as a second — no separate
    unigram pass. LLR = 2·Σ k·ln(kN/(RC)) with zero cells
    contributing zero.

    Determinism: all four cell counts are exact integers; the four ln
    terms are a FIXED expression (written-order sum of four scalars,
    not a variable-length fold); srnd4; the cut is TakeOrdered with a
    (w1, w2) tie-break.

    Scale shape: one explode + map-side-combining groupBy collapses
    the corpus to its distinct-bigram frame; marginals ride windows
    PARTITIONED by w1 / by w2 over that frame (vocabulary-bounded,
    never single-task); the final cut is TakeOrderedAndProject.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("ts")
    )
    big = toks.select(
        F.explode(
            F.expr(
                "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                " (w, i) -> struct(w as w1, ts[i + 1] as w2))"
            )
        ).alias("b")
    )
    cells = big.groupBy(
        F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    ).agg(F.count("*").cast("long").alias("k11"))
    marg = cells.select(
        "w1",
        "w2",
        "k11",
        F.sum("k11").over(Window.partitionBy("w1")).cast("long").alias("r"),
        F.sum("k11").over(Window.partitionBy("w2")).cast("long").alias("c"),
        F.sum("k11").over(Window.partitionBy()).cast("long").alias("n"),
    )
    k11 = F.col("k11").cast("double")
    r = F.col("r").cast("double")
    c = F.col("c").cast("double")
    n = F.col("n").cast("double")
    k12 = F.col("r") - F.col("k11")
    k21 = F.col("c") - F.col("k11")
    llr = 2.0 * (
        k11 * F.log(k11 * n / (r * c))
        + F.when(
            k12 > 0,
            k12.cast("double") * F.log(k12.cast("double") * n / (r * (n - c))),
        ).otherwise(F.lit(0.0))
        + F.when(
            k21 > 0,
            k21.cast("double") * F.log(k21.cast("double") * n / ((n - r) * c)),
        ).otherwise(F.lit(0.0))
        # k22 guarded like k12/k21: a degenerate corpus where one
        # token heads or tails every bigram makes k22 = 0 and an
        # unguarded 0·ln(0) yields NaN llr on both engines (r12
        # ADVICE) — zero cells contribute zero, the Dunning convention
        + F.when(
            F.col("n") - F.col("r") - F.col("c") + F.col("k11") > 0,
            (n - r - c + k11)
            * F.log((n - r - c + k11) * n / ((n - r) * (n - c))),
        ).otherwise(F.lit(0.0))
    )
    scored = marg.filter(F.col("k11") >= _LLR_MIN_COUNT).select(
        "w1", "w2", "k11", srnd(llr, 4).alias("llr")
    )
    return scored.orderBy(
        F.desc("llr"), F.asc("w1"), F.asc("w2")
    ).limit(_LLR_TOPK)


q_colloc_llr.__doc__ = q_colloc_llr.__doc__.format(k=_LLR_TOPK)


# ------------------------------------- C242 Heaps'-law vocabulary fit


@query(
    "q_heaps_law",
    oracle=f"""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT w) AS BIGINT) AS vocab
        FROM (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ) GROUP BY source
    ),
    pts AS (
        SELECT source, n_tokens, vocab,
               ln(CAST(n_tokens AS DOUBLE)) AS x,
               ln(CAST(vocab AS DOUBLE)) AS y
        FROM per_src
    ),
    ols AS (
        SELECT CAST(count(*) AS BIGINT) AS g,
            list_sum(list(x ORDER BY source)) AS sx,
            list_sum(list(y ORDER BY source)) AS sy,
            list_sum(list(x * x ORDER BY source)) AS sxx,
            list_sum(list(x * y ORDER BY source)) AS sxy
        FROM pts
    )
    SELECT g AS n_sources,
        {sql_srnd(
            "(g * sxy - sx * sy) / nullif(g * sxx - sx * sx, 0.0)", 6
        )} AS beta,
        {sql_srnd(
            "exp((sy - ((g * sxy - sx * sy)"
            "           / nullif(g * sxx - sx * sx, 0.0)) * sx) / g)", 4
        )} AS k_coef
    FROM ols
    """,
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit (C242): V = k·N^β across sources — regress
    ln(vocab) on ln(tokens) over the per-source points to estimate
    the vocabulary-growth exponent β (≈0.4–0.6 for natural text; ≈1
    means every new token is new — an id-like column masquerading as
    text; ≈0 a closed vocabulary). The capacity-planning curve behind
    tokenizer vocab sizing, and the growth-law view of C223's Chao1
    asymptote.

    Determinism: per-source token and distinct-token counts are exact
    integers; each source contributes fixed ln doubles; the OLS sums
    fold in source order (C69 — ≤|sources| terms); β and k are fixed
    guarded expressions, srnd'd.

    Scale shape: explode + ONE map-side-combining distinct-style agg
    per source (countDistinct shuffles words once); the regression
    runs on the |sources|-row frame. Vocabulary never leaves the
    executors — only (n_tokens, vocab) pairs do.
    """
    per_src = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("w").cast("long").alias("vocab"),
        )
    )
    pts = per_src.select(
        "source",
        F.log(F.col("n_tokens").cast("double")).alias("x"),
        F.log(F.col("vocab").cast("double")).alias("y"),
    )

    def fold(expr: str) -> F.Column:
        return F.expr(
            f"aggregate(array_sort(collect_list(struct(source, {expr} as t))),"
            " CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t)"
        )

    ols = pts.agg(
        F.count("*").cast("long").alias("g"),
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("x * x").alias("sxx"),
        fold("x * y").alias("sxy"),
    )
    g = F.col("g").cast("double")
    beta = (g * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        g * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return ols.select(
        F.col("g").alias("n_sources"),
        srnd(beta, 6).alias("beta"),
        srnd(
            F.exp((F.col("sy") - beta * F.col("sx")) / g), 4
        ).alias("k_coef"),
    )


# --------------------------------- C243 lognormal doc-length fit


@query(
    "q_lognormal_fit",
    oracle=f"""
    WITH q AS (
        SELECT CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1e9 + 0.5)
                    AS BIGINT) AS lq
        FROM documents WHERE n_chars > 0
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(lq) AS HUGEINT) AS s1,
               CAST(sum(CAST(lq AS HUGEINT) * lq) AS HUGEINT) AS s2
        FROM q
    )
    SELECT n,
        {sql_srnd("CAST(s1 AS DOUBLE) / n / 1e9", 6)} AS mu,
        {sql_srnd(
            "sqrt((CAST(s2 AS DOUBLE) / n"
            "      - (CAST(s1 AS DOUBLE) / n)"
            "        * (CAST(s1 AS DOUBLE) / n))"
            "     * n / (n - 1.0)) / 1e9", 6
        )} AS sigma,
        {sql_srnd("exp(CAST(s1 AS DOUBLE) / n / 1e9)", 2)} AS median_len
    FROM s
    """,
)
def q_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal document-length fit (C243): MLE (μ, σ) of
    ln(n_chars) plus the implied median e^μ — the canonical
    heavy-tailed length model whose parameters feed chunking budgets
    (C9/C50) and make C41's length bands comparable across corpora
    (two corpora with equal μ,σ band identically at any scale).

    Determinism: each row's ln is quantized to 1e-9 integer units
    BEFORE accumulation (the C208 idiom — float sums fold-order-drift
    across engines; integer sums cannot), Σ and Σ² in
    HUGEINT/DECIMAL(38,0); μ/σ/median are fixed expressions over the
    exact sums, srnd'd.

    Scale shape: one map-side-combining full-table agg to a single
    3-number row — sufficient statistics, mergeable across any
    partitioning (the lognormal of 100 TB is the lognormal of its
    per-file partial sums).
    """
    dec = "decimal(38,0)"
    lq = F.floor(
        F.log(F.col("n_chars").cast("double")) * 1e9 + 0.5
    ).cast("long")
    s = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(lq.alias("lq"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("lq").cast(dec)).alias("s1"),
            F.sum(F.col("lq").cast(dec) * F.col("lq")).alias("s2"),
        )
    )
    n = F.col("n").cast("double")
    m = F.col("s1").cast("double") / n
    return s.select(
        F.col("n"),
        srnd(m / 1e9, 6).alias("mu"),
        srnd(
            F.sqrt(
                (F.col("s2").cast("double") / n - m * m) * n / (n - 1.0)
            )
            / 1e9,
            6,
        ).alias("sigma"),
        srnd(F.exp(m / 1e9), 2).alias("median_len"),
    )


# ------------------------------------ C244 per-user behavioral entropy


@query(
    "q_session_entropy",
    oracle=f"""
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS k
        FROM events GROUP BY 1, 2
    ),
    per_user AS (
        SELECT user_id,
               CAST(sum(k) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_types,
               list_sum(list(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE))
                             ORDER BY event_type)) AS sklnk
        FROM c GROUP BY user_id
    )
    SELECT user_id, n AS n_events, n_types,
           {sql_srnd(
               "ln(CAST(n AS DOUBLE)) - sklnk / CAST(n AS DOUBLE)", 6
           )} AS entropy
    FROM per_user
    """,
)
def q_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy (C244): Shannon entropy of each
    user's event-type distribution, H = ln n − (Σ k·ln k)/n — the
    per-entity diversity score (0 = single-type bots/scrapers, ln 5 =
    uniform browsing) that C183's transition entropy aggregates
    globally; the standard per-user feature for bot screens and
    engagement segmentation.

    Determinism: per-(user, type) counts are exact; each user's Σ
    k·ln k folds over ≤|types| fixed ln terms in type order (C69);
    one srnd6 per user.

    Scale shape: one map-side-combining groupBy(user, type), then a
    groupBy(user) whose per-user fold is bounded by the type
    cardinality — output rows scale with users, all work stays
    key-partitioned (no window, no self-join).
    """
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("long").alias("k"))
    )
    fold = F.expr(
        "aggregate(array_sort(collect_list(struct(event_type,"
        " CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE)) as t))),"
        " CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t)"
    )
    per_user = c.groupBy("user_id").agg(
        F.sum("k").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_types"),
        fold.alias("sklnk"),
    )
    n = F.col("n").cast("double")
    return per_user.select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_types",
        srnd(F.log(n) - F.col("sklnk") / n, 6).alias("entropy"),
    )
