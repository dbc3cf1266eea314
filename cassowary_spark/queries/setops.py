"""Set operations (SURVEY.md §2 B30–B32)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )


@query(
    "q_union",
    oracle="""
    SELECT DISTINCT nationkey, side FROM (
        SELECT c_nationkey AS nationkey, 'cust' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supp' AS side FROM supplier
    )
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + dedup (= UNION) with a provenance tag (B30)."""
    c = _cust_nations(spark, sf_dir).withColumn("side", F.lit("cust"))
    s = _supp_nations(spark, sf_dir).withColumn("side", F.lit("supp"))
    return c.unionByName(s).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (B31): nations having both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "q_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (B32): customers with finished orders but no pending ones.

    `subtract` is EXCEPT DISTINCT (any match on the right removes the
    value entirely) — not `exceptAll().distinct()`, which would keep a
    value that merely occurs more often on the left. (Every nation has
    both customers and suppliers at sf0.01, so the round-1 nationkey
    version returned 0 rows — agreement on empty proves nothing; this
    form returns 52 rows.)
    """
    o = load_table(spark, sf_dir, "orders")
    f_custs = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    p_custs = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    return f_custs.subtract(p_custs)


@query(
    "q_setops_all",
    oracle="""
    SELECT 'intersect_all' AS op, custkey, count(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY custkey
    UNION ALL
    SELECT 'except_all' AS op, custkey, count(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY custkey
    """,
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL (B31/B32, bag semantics): per
    customer, finished-order keys intersected/subtracted against
    open-order keys AS MULTISETS — intersectAll keeps
    min(multiplicity), exceptAll keeps the count difference. These are
    different answers from the DISTINCT variants whenever a customer
    has several orders in a status, which most do; the output
    re-aggregates to (op, key, multiplicity) so the bag cardinalities
    themselves are what the oracle hashes.

    Scale shape: Spark plans both ALL variants as a single count-
    per-key aggregation + generate (no pairwise matching) — one
    shuffle per operand, the same cost as the DISTINCT forms.
    """
    o = load_table(spark, sf_dir, "orders")
    f_custs = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o_custs = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    inter = (
        f_custs.intersectAll(o_custs)
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "custkey", "n")
    )
    exc = (
        f_custs.exceptAll(o_custs)
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "custkey", "n")
    )
    return inter.unionByName(exc)
