"""Round-9 wave 49 (SURVEY.md §2): lexical diversity (C185) and the
Mantel-Haenszel pooled odds ratio (C186).

C185 adds the vocabulary-richness axis the text-quality family
lacked; C186 closes the stratified-2×2 gap in the causal/epidemiology
battery (C175 matches on means, C177 audits directions — MH pools
ODDS across strata, the categorical-outcome workhorse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ------------------------------------------ C185 lexical diversity


@query(
    "q_lexical_diversity",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    t AS (SELECT source, word FROM tok WHERE word <> ''),
    s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT word) AS BIGINT) AS n_types
        FROM t GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           {sql_srnd(
               "CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)",
               6)} AS ttr,
           {sql_srnd(
               "CAST(n_types AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE))",
               6)} AS root_ttr
    FROM s
    """,
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity (C185): per-source type-token ratio and root
    TTR (Guiraud's index, types/√tokens — the length-robust variant,
    since plain TTR decays mechanically as corpora grow) — the
    vocabulary-richness axis of the text-quality battery: C20's
    stats measure length/shape, C69 entropy measures in-doc
    repetition, TTR measures CROSS-doc vocabulary breadth (a
    template-stamped source shows high volume, low types — the
    boilerplate signature C27's heavy hitters then names).

    Determinism: token and distinct-token counts are exact BIGINTs
    over the same whitespace split both engines share (C29's
    tokenizer); the two ratios are single srnd6 expressions.

    Scale shape: one explode feeding a (source, word)-keyed
    count-distinct — the partial-agg distinct shuffle every vocab
    op pays (term-keyed, map-side combined); the ratio frame is
    |sources| rows.
    """
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    t = d.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    s = t.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("word").cast("long").alias("n_types"),
    )
    return s.select(
        "source",
        "n_tokens",
        "n_types",
        srnd(
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("ttr"),
        srnd(
            F.col("n_types").cast("double")
            / F.sqrt(F.col("n_tokens").cast("double")),
            6,
        ).alias("root_ttr"),
    )


# -------------------------------- C186 Mantel-Haenszel odds ratio


@query(
    "q_mh_odds_ratio",
    oracle=f"""
    WITH e AS (
        SELECT CAST((day(ts) - 1) // 7 AS INT) AS wk,
               CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                        1, 8) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END AS t,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    cells AS (
        SELECT CASE WHEN wk > 3 THEN 3 ELSE wk END AS stratum,
               CAST(sum(t * y) AS BIGINT) AS a,
               CAST(sum(t * (1 - y)) AS BIGINT) AS b,
               CAST(sum((1 - t) * y) AS BIGINT) AS c,
               CAST(sum((1 - t) * (1 - y)) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY 1
    ),
    terms AS (
        SELECT stratum,
               {sql_srnd(
                   "CAST(a AS DOUBLE) * CAST(d AS DOUBLE)"
                   " / CAST(n AS DOUBLE)", 8)} AS num,
               {sql_srnd(
                   "CAST(b AS DOUBLE) * CAST(c AS DOUBLE)"
                   " / CAST(n AS DOUBLE)", 8)} AS den
        FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           {sql_srnd("list_sum(list(num ORDER BY stratum))", 8)} AS mh_num,
           {sql_srnd("list_sum(list(den ORDER BY stratum))", 8)} AS mh_den,
           {sql_srnd(
               "list_sum(list(num ORDER BY stratum))"
               " / nullif(list_sum(list(den ORDER BY stratum)), 0.0)",
               6)} AS mh_or
    FROM terms
    """,
)
def q_mh_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio (C186): across weekly strata,
    OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ) for the 2×2 tables of
    (hash-assigned treatment × purchase outcome) — the categorical-
    outcome pooling that is VALID under stratum confounding where the
    naive pooled 2×2 is Simpson-vulnerable (C177 detects the
    pathology; MH is the classical cure, weighting each stratum's OR
    by bᵢcᵢ/nᵢ). Completes the causal battery's outcome types:
    continuous (C160/C175), rates (C139), now odds.

    Determinism: the four cell counts per stratum are exact BIGINTs
    from ONE conditional-agg pass; each stratum's num/den is a fixed
    IEEE expression srnd8'd; the two pooled sums fold ≤4 quantized
    terms in stratum order (C69), and the final ratio srnd6s once
    with the explicit zero-denominator nullif.

    Scale shape: one map-side-combining groupBy to 4 strata rows;
    everything after is arithmetic over those rows. On the
    hash-randomized fixture the true OR is 1 (gate: CI-free sanity
    band), and planted-association fixtures must recover their
    constructed OR exactly.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    t = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 1
    ).cast("int")
    y = (F.col("event_type") == "purchase").cast("int")
    e = ev.select(
        F.least(((F.dayofmonth("ts") - 1) / 7).cast("int"), F.lit(3)).alias(
            "stratum"
        ),
        t.alias("t"),
        y.alias("y"),
    )
    cells = e.groupBy("stratum").agg(
        F.sum(F.col("t") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("t") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("t")) * (1 - F.col("y"))).cast("long").alias("d"),
        F.count("*").cast("long").alias("n"),
    )
    num = srnd(
        F.col("a").cast("double") * F.col("d").cast("double")
        / F.col("n").cast("double"),
        8,
    )
    den = srnd(
        F.col("b").cast("double") * F.col("c").cast("double")
        / F.col("n").cast("double"),
        8,
    )
    terms = cells.select("stratum", num.alias("num"), den.alias("den"))
    fold = (
        "aggregate(array_sort(collect_list(struct(stratum, {c}))),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.{c})"
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_strata"),
        srnd(F.expr(fold.format(c="num")), 8).alias("mh_num"),
        srnd(F.expr(fold.format(c="den")), 8).alias("mh_den"),
        srnd(
            F.expr(fold.format(c="num"))
            / F.nullif(F.expr(fold.format(c="den")), F.lit(0.0)),
            6,
        ).alias("mh_or"),
    )
