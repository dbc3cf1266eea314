"""Star Schema Benchmark battery (SURVEY.md §2 B48): one
representative query per SSB flight, adapted to the fixture's TPC-H
star schema (SSB itself is a TPC-H derivative — its ``lineorder``
fact is lineitem⋈orders, its dims are part/supplier/customer/date;
the fixture's ``o_orderdate``/``l_shipdate`` timestamps stand in for
the date dim, and region/nation come from the normalized chain).
SSB's four flights probe the four classic star-join shapes:

- Q1.x — fact-only predicate scan with a derived measure (no dim
  rollup): revenue from discount×price under date/discount/quantity
  envelopes. Pure scan throughput.
- Q2.x — one selective dim (part category) + one region-filtered
  dim (supplier), rolled up by (year, brand). Tests dim-driven
  pruning of the fact table.
- Q3.x — two symmetric dims (customer nation × supplier nation)
  over a date range, rolled up by both + year. Tests the
  double-dim rollup.
- Q4.x — profit (revenue − cost) across ALL dims, rolled up by
  (year, nation). Tests the widest star with an arithmetic measure.

Money discipline is inherited from ``tpch.py`` (exact integer cents
through every sum); profit's cost term reuses Q9's documented
retail-price substitution (no partsupp in the fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.queries.tpch import _cents, _sql_cents
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


# ----------------------------------------------------------- flight 1


@query(
    "q_ssb_q1",
    oracle=f"""
    SELECT sum({_sql_cents("l_extendedprice * l_discount")}) / 100.0
               AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE year(o_orderdate) = 1996
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 25.0
    """,
)
def q_ssb_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB flight 1 (Q1.1 shape): discount-revenue forecast for one
    year — SSB's restatement of TPC-H Q6 with the date predicate on
    the ORDER date (forcing the fact⋈orders join that SSB's
    denormalized lineorder avoids; here it is the one shuffle).

    Scale shape: discount/quantity predicates push to the lineitem
    scan; the year filter prunes orders before the join; the sum is
    one exact-cents partial agg collapsing to a single row.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 25.0)
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1996
    )
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).agg(
        (
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
            / F.lit(100.0)
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ----------------------------------------------------------- flight 2


@query(
    "q_ssb_q2",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           p.p_brand,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}) / 100.0
               AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
         AND r.r_name = 'AMERICA'
    GROUP BY year(o.o_orderdate), p.p_brand
    """,
)
def q_ssb_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB flight 2 (Q2.1 shape): revenue by (year, brand) for one
    part category supplied from one region — the selective-dim star
    where two small dims prune the fact before a mid-cardinality
    rollup (~years × brands groups).

    Scale shape: the category-filtered part dim and the
    region→nation→supplier chain both broadcast into lineitem;
    lineitem⋈orders is the one real shuffle; the rollup key
    (~6 years × 25 brands) collapses map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    dims = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(dims), li["l_suppkey"] == F.col("s_suppkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year"),
        "p_brand",
    ).agg(
        (
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                )
            )
            / F.lit(100.0)
        ).alias("revenue")
    )


# ----------------------------------------------------------- flight 3


@query(
    "q_ssb_q3",
    oracle=f"""
    SELECT n1.n_name AS cust_nation,
           n2.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}) / 100.0
               AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    JOIN region r1 ON r1.r_regionkey = n1.n_regionkey
         AND r1.r_name = 'ASIA'
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
         AND r2.r_name = 'ASIA'
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(o.o_orderdate)
    """,
)
def q_ssb_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB flight 3 (Q3.1 shape): intra-region trade volume by
    (customer nation, supplier nation, year) — the symmetric
    double-dim rollup where the SAME region filter constrains both
    arms of the star (TPC-H Q7's cousin without the nation-pair
    disjunction).

    Scale shape: both nation/region chains broadcast; the date range
    prunes orders at the scan; lineitem⋈orders is the one shuffle;
    the (25×25×2)-bounded rollup collapses map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name"
    )
    n1 = F.broadcast(
        asia.select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    n2 = F.broadcast(
        asia.select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
    )
    return joined.groupBy(
        "cust_nation",
        "supp_nation",
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(
        (
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                )
            )
            / F.lit(100.0)
        ).alias("revenue")
    )


# ----------------------------------------------------------- flight 4


@query(
    "q_ssb_q4",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           n.n_name AS cust_nation,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}
               - {_sql_cents("p.p_retailprice * l.l_quantity * 0.1")}) / 100.0
               AS profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
         AND r.r_name = 'EUROPE'
    JOIN part p ON p.p_partkey = l.l_partkey
         AND p.p_type IN ('ECONOMY', 'STANDARD')
    GROUP BY year(o.o_orderdate), n.n_name
    """,
)
def q_ssb_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB flight 4 (Q4.1 shape): profit by (year, customer nation)
    for one region and two part categories — the widest SSB star
    with an arithmetic measure (revenue − cost; cost reuses Q9's
    retail-price substitution, documented there).

    Scale shape: part/customer/nation/region broadcast; one
    lineitem⋈orders shuffle; profit is a difference of two per-row
    cent quantizations summed exactly; the rollup is ≤ years × 25
    groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").isin("ECONOMY", "STANDARD")
    )
    profit = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ) - _cents(F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1))
    cdims = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cdims), o["o_custkey"] == F.col("c_custkey"))
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.col("n_name").alias("cust_nation"),
    ).agg((F.sum(profit) / F.lit(100.0)).alias("profit"))
