"""Round-8 wave 39 (SURVEY.md §2): Kish effective sample size (C166)
and tamper-evident hash chains per source (C167) — sampling
diagnostics and data-integrity manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# ----------------------------------------------- C166 Kish effective n


@query(
    "q_kish_ess",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           {sql_srnd(
               "CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE)"
               " / CAST(sum(n_chars * n_chars) AS DOUBLE)", 4)} AS ess,
           {sql_srnd(
               "CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE)"
               " / CAST(sum(n_chars * n_chars) AS DOUBLE)"
               " / CAST(count(*) AS DOUBLE)", 6)} AS ess_ratio
    FROM documents GROUP BY lang
    """,
)
def q_kish_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size (C166): ESS = (Σw)²/Σw² per
    language with document length as the sampling weight — the
    diagnostic for how much a weighted corpus mix (C28/C44/C75)
    actually shrinks statistical power (ESS/n = 1 means uniform
    weights, → 0 means a few heavy docs dominate). Run before
    trusting any weighted estimate.

    Determinism: weights are the integer n_chars column; Σw and Σw²
    are exact integer sums (w² ≤ ~2.5e5 per row — no overflow until
    ~3.7e13 rows); the two outputs are single fixed-order double
    expressions over those exact integers, srnd-quantized once.

    Scale shape: ONE map-side-combining groupBy on lang; everything
    else is row-local arithmetic. The cheapest possible diagnostic.
    """
    d = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    g = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").alias("sw"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sw2"),
    )
    ess = (
        F.col("sw").cast("double")
        * F.col("sw").cast("double")
        / F.col("sw2").cast("double")
    )
    return g.select(
        "lang",
        "n_docs",
        srnd(ess, 4).alias("ess"),
        srnd(ess / F.col("n_docs").cast("double"), 6).alias("ess_ratio"),
    )


# ----------------------------------------------- C167 per-source hash chain


@query(
    "q_hash_chain",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           list_reduce(
               list_prepend('', list(md5(text) ORDER BY doc_id)),
               (a, b) -> md5(a || b)) AS chain
    FROM documents GROUP BY source
    """,
)
def q_hash_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident hash chain per source (C167): fold each
    source's doc-id-ordered md5 leaves into a chained digest
    (chain_i = md5(chain_{i-1} || leaf_i), empty-string seed) — the
    audit manifest a data-custody pipeline publishes per delivery.
    ANY change — an edited doc, a dropped doc, a reordering — changes
    the chain, and verifying a delivery is re-running this query.
    Complements q_table_fingerprint (order-insensitive content hash)
    with the ORDER-SENSITIVE custody view.

    Determinism: md5 is bit-identical everywhere; the fold order is
    the doc_id sort on both engines (Spark
    aggregate(array_sort(collect_list(struct))) == DuckDB
    list_reduce over list(... ORDER BY doc_id) with the same seed).

    Scale shape: leaves hash row-locally at scan time (text never
    shuffles — only 32-hex leaves move); one source-keyed groupBy;
    the fold is row-local per source row. A source whose leaf list
    outgrows one row takes the Merkle evolution: chain fixed-size
    doc-id RANGES first (same groupBy with a range bucket in the
    key), then chain the per-range digests — two levels cover 10^12
    docs; the per-range layout is exactly this query keyed by
    (source, range).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.md5(F.col("text")).alias("leaf")
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(doc_id, leaf))),"
                " '', (acc, x) -> md5(concat(acc, x.leaf)))"
            ).alias("chain"),
        )
    )
