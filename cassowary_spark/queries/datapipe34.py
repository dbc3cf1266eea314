"""Round-8 wave 36 (SURVEY.md §2): difference-in-differences (C160)
and hard-negative mining for contrastive training data (C161).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.operators.similarity import as_double, cosine
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# --------------------------------------------- C160 difference-in-differences

_DID_CUTOVER = "2024-01-16"  # fixture events span 2024-01


@query(
    "q_diff_in_diff",
    oracle=f"""
    WITH e AS (
        SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                         1, 8) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END AS t,
               CASE WHEN ts >= TIMESTAMP '{_DID_CUTOVER}' THEN 1 ELSE 0
                    END AS p,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q
        FROM events
    ),
    c AS (
        SELECT
          CAST(sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
          CAST(sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
          CAST(sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
          CAST(sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
          CAST(sum(CASE WHEN t = 1 AND p = 0 THEN q ELSE 0 END) AS BIGINT) AS s_t_pre,
          CAST(sum(CASE WHEN t = 1 AND p = 1 THEN q ELSE 0 END) AS BIGINT) AS s_t_post,
          CAST(sum(CASE WHEN t = 0 AND p = 0 THEN q ELSE 0 END) AS BIGINT) AS s_c_pre,
          CAST(sum(CASE WHEN t = 0 AND p = 1 THEN q ELSE 0 END) AS BIGINT) AS s_c_post
        FROM e
    )
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           {sql_srnd("CAST(s_t_pre AS DOUBLE) / (CAST(n_t_pre AS DOUBLE) * 1000000.0)", 6)} AS m_t_pre,
           {sql_srnd("CAST(s_t_post AS DOUBLE) / (CAST(n_t_post AS DOUBLE) * 1000000.0)", 6)} AS m_t_post,
           {sql_srnd("CAST(s_c_pre AS DOUBLE) / (CAST(n_c_pre AS DOUBLE) * 1000000.0)", 6)} AS m_c_pre,
           {sql_srnd("CAST(s_c_post AS DOUBLE) / (CAST(n_c_post AS DOUBLE) * 1000000.0)", 6)} AS m_c_post,
           {sql_srnd(
               "(CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)"
               " - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE)"
               " - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)"
               "    - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE)))"
               " / 1000000.0", 6)} AS did
    FROM c
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (C160): the panel causal estimate —
    treatment-group outcome change minus control-group change across
    a cutover date. Treatment assigns row-locally by user-id hash
    (the C94 split discipline, i.e. a hash-randomized experiment);
    the period splits on a µs-aligned timestamp constant (safe
    against the events.ts ns-vs-µs read divergence: floor truncation
    preserves >= against an aligned bound). Complements q_ab_lift
    (cross-sectional z-test) with the pre/post panel dimension;
    uncertainty lives in the dedicated q_bootstrap_ci /
    q_delta_method_ci operators.

    Determinism: outcomes quantize to integer micro-units before the
    unordered sums (exact); the four cell means and the DiD contrast
    are FIXED-ORDER double expressions over those exact integers,
    textually parallel in both engines, srnd6-quantized once.

    Scale shape: ONE pass — 8 conditional aggregates over the event
    scan collapse to a single row; no shuffle wider than the 1-row
    final agg. At 100 TB this is the cheapest possible causal read:
    the whole estimate is map-side partials plus one combine.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    t = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
        == 1
    )
    p = F.col("ts") >= F.to_timestamp(F.lit(_DID_CUTOVER))
    q = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    e = ev.select(
        t.cast("int").alias("t"), p.cast("int").alias("p"), q.alias("q")
    )

    def cell(tv: int, pv: int, col, zero):
        return F.sum(
            F.when((F.col("t") == tv) & (F.col("p") == pv), col).otherwise(zero)
        )

    c = e.agg(
        cell(1, 0, F.lit(1), F.lit(0)).cast("long").alias("n_t_pre"),
        cell(1, 1, F.lit(1), F.lit(0)).cast("long").alias("n_t_post"),
        cell(0, 0, F.lit(1), F.lit(0)).cast("long").alias("n_c_pre"),
        cell(0, 1, F.lit(1), F.lit(0)).cast("long").alias("n_c_post"),
        cell(1, 0, F.col("q"), F.lit(0)).cast("long").alias("s_t_pre"),
        cell(1, 1, F.col("q"), F.lit(0)).cast("long").alias("s_t_post"),
        cell(0, 0, F.col("q"), F.lit(0)).cast("long").alias("s_c_pre"),
        cell(0, 1, F.col("q"), F.lit(0)).cast("long").alias("s_c_post"),
    )

    def mean(s: str, n: str):
        return srnd(
            F.col(s).cast("double") / (F.col(n).cast("double") * F.lit(1000000.0)),
            6,
        )

    did = (
        F.col("s_t_post").cast("double") / F.col("n_t_post").cast("double")
        - F.col("s_t_pre").cast("double") / F.col("n_t_pre").cast("double")
        - (
            F.col("s_c_post").cast("double") / F.col("n_c_post").cast("double")
            - F.col("s_c_pre").cast("double") / F.col("n_c_pre").cast("double")
        )
    ) / F.lit(1000000.0)
    return c.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        mean("s_t_pre", "n_t_pre").alias("m_t_pre"),
        mean("s_t_post", "n_t_post").alias("m_t_post"),
        mean("s_c_pre", "n_c_pre").alias("m_c_pre"),
        mean("s_c_post", "n_c_post").alias("m_c_post"),
        srnd(did, 6).alias("did"),
    )


# --------------------------------------------- C161 hard-negative mining

_HN_QUERIES = 5  # vec_id 0..4 are the anchors
_HN_K = 5


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
               label AS qlabel
        FROM embeddings WHERE vec_id < {_HN_QUERIES}
    ),
    s AS (
        SELECT q.qid, e.vec_id,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id >= {_HN_QUERIES} AND e.label <> q.qlabel
    ),
    r AS (
        SELECT qid, vec_id, cos_sim,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM s
    )
    SELECT CAST(qid AS BIGINT) AS qid, vec_id, CAST(rnk AS INT) AS rnk,
           {sql_srnd("cos_sim", 4)} AS cos_sim
    FROM r WHERE rnk <= {_HN_K}
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (C161): for each anchor embedding, the
    top-k most-similar vectors with a DIFFERENT label — the
    contrastive-training data op (the negatives that actually teach
    the margin are the nearest wrong-label ones, not random draws).

    Determinism: dot products are positional sequential folds in
    double on both engines (operators/similarity.dot ==
    list_dot_product), so the RAW ranking order is bit-identical;
    cos_sim is srnd4-quantized only in the output, and vec_id breaks
    rank ties.

    Scale shape: anchors broadcast (Q rows); scoring is a row-local
    fold over the corpus scan with the wrong-label filter applied
    before ranking; per-anchor top-k is a qid-partitioned window over
    Q×N scored rows. At 100 TB mine within ANN candidates instead:
    the same scoring stage consumes `ann_lsh_topk`'s bucket-pruned
    candidate set (documented evolution, same final operator), so the
    corpus term drops to the probe volume.
    """
    e = load_table(spark, sf_dir, "embeddings")
    qdf = e.filter(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        e.filter(F.col("vec_id") >= _HN_QUERIES)
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "vec_id",
            cosine(as_double("embedding"), as_double("qv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HN_K)
        .select(
            F.col("qid").cast("long").alias("qid"),
            "vec_id",
            F.col("rnk").cast("int").alias("rnk"),
            srnd("cos_sim", 4).alias("cos_sim"),
        )
    )
