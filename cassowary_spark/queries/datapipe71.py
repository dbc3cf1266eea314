"""Round-13 wave 74 (SURVEY.md §2): ordinal/categorical association
finishers — Cliff's delta (C263), the ordinal dominance effect size
completing the C251/C255 effect-size pair, and Theil's uncertainty
coefficient (C264), the asymmetric information-theoretic association
member beside C124 chi-square / C233 Cramér's V.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

_CD_A, _CD_B = "click", "view"

# ----------------------------------------- C263 Cliff's delta


@query(
    "q_cliffs_delta",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS u,
               CAST(sum(CASE WHEN event_type = '{_CD_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = '{_CD_B}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cb
        FROM events WHERE event_type IN ('{_CD_A}', '{_CD_B}')
        GROUP BY 1
    ),
    c AS (
        SELECT ca, cb,
               coalesce(CAST(sum(cb) OVER (ORDER BY u
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS cb_lt,
               CAST(sum(cb) OVER (ORDER BY u
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cb_le,
               CAST(sum(cb) OVER () AS BIGINT) AS nb
        FROM cells
    ),
    agg AS (
        SELECT CAST(sum(ca) AS BIGINT) AS na,
               CAST(max(nb) AS BIGINT) AS nb,
               CAST(sum(CAST(ca AS HUGEINT) * cb_lt) AS HUGEINT) AS gt,
               CAST(sum(CAST(ca AS HUGEINT) * (nb - cb_le)) AS HUGEINT)
                   AS lt
        FROM c
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(gt AS BIGINT) AS n_greater,
           CAST(lt AS BIGINT) AS n_less,
           {sql_srnd(
               "CAST(gt - lt AS DOUBLE)"
               " / (CAST(na AS DOUBLE) * nb)", 6
           )} AS cliffs_delta
    FROM agg
    """,
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta (C263): δ = [#(x_a > x_b) − #(x_a < x_b)] /
    (n_a·n_b) over all cross-sample pairs of '{a}' vs '{b}' event
    cents — the ORDINAL dominance effect size completing the r13
    effect-size pair (C251 Cohen's d assumes interval scale and equal
    variances matter; C255 Hodges–Lehmann gives the shift in units;
    δ ∈ [−1, 1] needs only an ordering and maps directly onto the
    Mann-Whitney U: δ = 2U/(n_a·n_b) − 1).

    Pure integers via the CUMULATIVE-MERGE form (not a cells cross
    product — cents quantization leaves ~20k distinct values per
    side, so domain² is 400M pair cells; the first cut measured
    8.8 s at sf0.1): one merged per-value cells frame carries both
    samples' counts, one ordered window yields b's exclusive/
    inclusive cumulatives, and #(a>b) = Σ ca·cum_b(<v),
    #(a<b) = Σ ca·(n_b − cum_b(≤v)) — O(domain) work, ties
    contribute to neither count, products in HUGEINT/DECIMAL. One
    srnd6 division.

    Scale shape: one conditional-count groupBy(value-cell), one
    domain-bounded ordered window (the operators/ranks counts-frame
    discipline — value cells, never rows), a 1-row reduce.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_CD_A, _CD_B)
    )
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    u = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    cells = ev.groupBy(u.alias("u")).agg(
        F.sum(F.when(F.col("event_type") == _CD_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == _CD_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    w_lt = Window.orderBy("u").rowsBetween(Window.unboundedPreceding, -1)
    w_le = Window.orderBy("u").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = cells.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(w_lt), F.lit(0)).cast("long").alias("cb_lt"),
        F.sum("cb").over(w_le).cast("long").alias("cb_le"),
        F.sum("cb").over(Window.partitionBy()).cast("long").alias("nb"),
    )
    agg = c.agg(
        F.sum("ca").cast("long").alias("na"),
        F.max("nb").cast("long").alias("nb"),
        F.sum(F.col("ca").cast(dec) * F.col("cb_lt")).alias("gt"),
        F.sum(F.col("ca").cast(dec) * (F.col("nb") - F.col("cb_le"))).alias(
            "lt"
        ),
    )
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.col("gt").cast("long").alias("n_greater"),
        F.col("lt").cast("long").alias("n_less"),
        srnd(
            (F.col("gt") - F.col("lt")).cast("double")
            / (F.col("na").cast("double") * F.col("nb")),
            6,
        ).alias("cliffs_delta"),
    )


q_cliffs_delta.__doc__ = q_cliffs_delta.__doc__.format(a=_CD_A, b=_CD_B)


# ------------------------------ C264 Theil's uncertainty coefficient


@query(
    "q_theil_u",
    oracle=f"""
    WITH cells AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
    lmarg AS (
        SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM cells GROUP BY 1
    ),
    smarg AS (
        SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM cells GROUP BY 1
    ),
    hl AS (
        SELECT CAST(sum(CAST(floor(
                   -(CAST(nl AS DOUBLE) / (SELECT nn FROM tot))
                   * ln(CAST(nl AS DOUBLE) / (SELECT nn FROM tot))
                   * 100000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq,
               CAST(count(*) AS BIGINT) AS n_langs
        FROM lmarg
    ),
    hls AS (
        SELECT CAST(sum(CAST(floor(
                   -(CAST(c.n AS DOUBLE) / (SELECT nn FROM tot))
                   * ln(CAST(c.n AS DOUBLE) / s.ns)
                   * 100000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq
        FROM cells c JOIN smarg s ON s.source = c.source
    )
    SELECT (SELECT nn FROM tot) AS n_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM smarg) AS n_sources,
           (SELECT n_langs FROM hl) AS n_langs,
           {sql_srnd("CAST((SELECT hq FROM hl) AS DOUBLE) / 1e8", 6)}
               AS h_lang,
           {sql_srnd("CAST((SELECT hq FROM hls) AS DOUBLE) / 1e8", 6)}
               AS h_lang_given_source,
           {sql_srnd(
               "(CAST((SELECT hq FROM hl) AS DOUBLE) / 1e8"
               " - CAST((SELECT hq FROM hls) AS DOUBLE) / 1e8)"
               " / (CAST((SELECT hq FROM hl) AS DOUBLE) / 1e8)", 6
           )} AS theil_u
    """,
)
def q_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(lang|source) (C264): the
    fraction of language-label entropy explained by knowing the
    source, U = (H(L) − H(L|S))/H(L) — the ASYMMETRIC
    information-theoretic association member beside C124 chi-square
    and C233 Cramér's V (both symmetric): "does source predict
    language" and "does language predict source" are different
    questions, and U answers exactly one of them. 0 = independent,
    1 = source determines language.

    Determinism: exact cell/marginal counts; every −p·ln term
    floor-quantizes (1e-8) before its bounded-domain sum (≤ |S|·|L|
    cells); H(L|S) folds the joint form −Σ (n_sl/N)·ln(n_sl/n_s) so
    no per-source intermediate entropies exist to re-sum; three
    srnd6 outputs plus exact counts.

    Scale shape: one (source, lang) partial agg (domain-bounded
    cells), two marginal rollups off it, 1-row reduces — no windows,
    the one join is cells⋈source-marginal (both tiny).
    """
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n")
    )
    # r14: the marginal rollups, both entropy folds and the final
    # 1-row join ladder collapse into row-local HOF arithmetic over
    # the packed cell array (was 5 extra jobs over a persisted ≤
    # |S|·|L|-row frame). The quantized entropy terms are exact
    # BIGINTs, so the integer fold is order-independent by
    # construction — identical to the old unordered F.sum.
    packed = cells.agg(
        F.expr("array_sort(collect_list(struct(source, lang, n)))").alias(
            "cs"
        )
    ).select(
        "cs",
        F.expr("aggregate(cs, 0L, (a, x) -> a + x.n)").alias("nn"),
        F.expr("array_sort(array_distinct(transform(cs, x -> x.lang)))")
        .alias("langs"),
        F.expr("array_sort(array_distinct(transform(cs, x -> x.source)))")
        .alias("srcs"),
    )
    nl = (
        "CAST(aggregate(filter(cs, y -> y.lang = x), 0L,"
        " (al, yl) -> al + yl.n) AS DOUBLE)"
    )
    ns = (
        "CAST(aggregate(filter(cs, z -> z.source = x.source), 0L,"
        " (asrc, zs) -> asrc + zs.n) AS DOUBLE)"
    )
    j = packed.select(
        "nn",
        F.expr("CAST(size(srcs) AS BIGINT)").alias("n_sources"),
        F.expr("CAST(size(langs) AS BIGINT)").alias("n_langs"),
        F.expr(
            "aggregate(langs, 0L, (acc, x) -> acc +"
            f" CAST(floor(-({nl} / CAST(nn AS DOUBLE))"
            f" * ln({nl} / CAST(nn AS DOUBLE)) * 1.0E8 + 0.5) AS BIGINT))"
        ).alias("hq"),
        F.expr(
            "aggregate(cs, 0L, (acc, x) -> acc +"
            " CAST(floor(-(CAST(x.n AS DOUBLE) / CAST(nn AS DOUBLE))"
            f" * ln(CAST(x.n AS DOUBLE) / {ns}) * 1.0E8 + 0.5) AS BIGINT))"
        ).alias("hq2"),
    )
    h1 = F.col("hq").cast("double") / 1e8
    h2 = F.col("hq2").cast("double") / 1e8
    return j.select(
        F.col("nn").alias("n_docs"),
        "n_sources",
        "n_langs",
        srnd(h1, 6).alias("h_lang"),
        srnd(h2, 6).alias("h_lang_given_source"),
        srnd((h1 - h2) / h1, 6).alias("theil_u"),
    )
