"""TPC-H report battery, part 2 (SURVEY.md §2 B47): the remaining 11
classic decision-support queries — Q2/Q5/Q8/Q9/Q11/Q12/Q15/Q16/Q17/
Q20/Q21 — completing the full 22-query suite started in ``tpch.py``.

The fixture's star schema (FIXTURES.md) has no ``partsupp`` table, no
ship-mode column, and no commit/receipt dates, so the queries that
depend on those are ADAPTED — each docstring states the substitution —
while preserving the canonical *plan shape* the query exists to
exercise (correlated min subquery for Q2, double-EXISTS for Q21,
nested IN + HAVING for Q20, scalar-subquery threshold for Q11, …).
Substitution glossary used throughout:

- "supply cost" of a (part, supplier) pair = the minimum observed
  per-unit price in lineitem, quantized to cents
  (``min(cents(l_extendedprice / l_quantity))``) — exact integer min.
- "late" line = shipped more than 60 days after the order date
  (same adaptation as Q4 in ``tpch.py``).
- "ship mode" = ``l_linestatus`` (the only line-level categorical).
- supplier "complaints" = negative account balance.

Float discipline is inherited from ``tpch.py``: money is quantized to
integer cents per-row BEFORE any sum/min/max, so every aggregate that
feeds a comparison, threshold, or sort key is exact integer
arithmetic; the only double ops are final single-step divisions and
``srnd``-stabilized ratios, identical op-for-op in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

from cassowary_spark.queries.tpch import _cents, _sql_cents


# ------------------------------------------- Q5 local supplier volume


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}) / 100.0
               AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
         AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume (B47): revenue per nation for
    one region-year where the customer and the supplier share a
    nation — the query whose join graph closes a cycle (lineitem
    reaches nation through BOTH the customer and the supplier arm).

    Scale shape: nation and region always broadcast; the
    c_nationkey = s_nationkey equality rides the lineitem⋈supplier
    join as a residual, so no extra shuffle materializes the cycle.
    orders⋈lineitem is the one big exchange; the rollup key is ≤25
    nations, collapsing map-side.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy("n_name").agg(
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


# ---------------------------------------------- Q8 national market share


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           {sql_srnd(
               "CAST(sum(CASE WHEN n2.n_name = 'NATION_7' THEN "
               + _sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")
               + " ELSE 0 END) AS DOUBLE) / sum("
               + _sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")
               + ")", 4)} AS mkt_share,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}) / 100.0
               AS total_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY year(o.o_orderdate)
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share (B47, adapted: the part filter
    is ``p_type = 'PROMO'`` — the fixture has no ``p_mfgr``): one
    nation's share of a region's PROMO-part revenue per year — the
    widest join in the suite (7 tables, nation twice) feeding a
    conditional-sum ratio.

    Scale shape: part/supplier/nation×2/region all broadcast at dim
    cardinality (bucket-join at 100 TB); lineitem⋈orders is the one
    real shuffle. Both the NATION_7 numerator and the denominator
    ride a single partial agg over exact cents; the share is one
    srnd-stabilized double division per year row.
    """
    cents = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n1 = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_regionkey").alias("n1_region"),
        )
    )
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r["r_regionkey"])
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_7", cents).otherwise(
                F.lit(0)
            )
        ).alias("__nation"),
        F.sum(cents).alias("__total"),
    )
    return agg.select(
        "o_year",
        srnd(
            F.col("__nation").cast("double") / F.col("__total"), 4
        ).alias("mkt_share"),
        (F.col("__total") / F.lit(100.0)).alias("total_revenue"),
    )


# ---------------------------------------------- Q9 product-type profit


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}
               - {_sql_cents("p.p_retailprice * l.l_quantity * 0.1")}) / 100.0
               AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (B47, adapted: with no partsupp
    there is no ``ps_supplycost``, so unit cost = 10% of the part's
    retail price — profit = revenue − cents(p_retailprice × qty ×
    0.1)): profit on widget-named parts by supplier nation and year.

    Scale shape: the LIKE-filtered part side broadcasts; supplier and
    nation broadcast; lineitem⋈orders is the one shuffle. Profit is a
    difference of two per-row cent quantizations summed as exact
    integers — the (nation, year) rollup key is ~150 values,
    collapsing map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    amount = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ) - _cents(
        F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg((F.sum(amount) / F.lit(100.0)).alias("sum_profit"))


# -------------------------------------------------- Q11 important stock


@query(
    "q_tpch_q11",
    oracle=f"""
    WITH vals AS (
        SELECT l.l_partkey,
               sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")})
                   AS value_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
             AND n.n_name = 'NATION_3'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey,
           value_cents / 100.0 AS part_value
    FROM vals
    WHERE CAST(value_cents AS DOUBLE)
          > (SELECT sum(value_cents) * 0.002 FROM vals)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock identification (B47, adapted: with no
    partsupp, a part's "stock value" is the lineitem revenue supplied
    by one nation's suppliers): parts whose value exceeds a fixed
    fraction of the nation's total — the groupBy-vs-global-scalar
    threshold shape.

    Scale shape: the nation filter prunes suppliers before the
    broadcast join into lineitem; ONE part-keyed shuffle builds the
    per-part values, and the global total is a 1-row re-aggregation of
    that same frame broadcast back for the threshold compare — the
    per-part frame is computed once, not twice. Threshold compare is
    exact-int × one double multiply, identical both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    vals = (
        li.join(F.broadcast(s.join(n, s["s_nationkey"] == n["n_nationkey"])),
                li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                )
            ).alias("value_cents")
        )
    )
    total = vals.agg(
        (F.sum("value_cents") * F.lit(0.002)).alias("__threshold")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents").cast("double") > F.col("__threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents") / F.lit(100.0)).alias("part_value"),
        )
    )


# ------------------------------------- Q12 shipping modes and priority


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping modes and order priority (B47, adapted: the
    fixture has no ship mode or commit/receipt dates, so the grouping
    categorical is ``l_linestatus`` and "late" = shipped >60 days
    after the order date): late lines per status, split into
    high/low-priority counts — the conditional-count pivot shape.

    Scale shape: the year filter pushes to the lineitem scan; one
    order-keyed shuffle joins in the priority; the lateness predicate
    is a row-local timestamp compare. Two CASE-sums ride one partial
    agg over a 2-value group key.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
            "high_line_count"
        ),
        F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
            "low_line_count"
        ),
    )


# ----------------------------------------------------- Q15 top supplier


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               sum({_sql_cents("l_extendedprice * (1.0 - l_discount)")})
                   AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           rev.total_cents / 100.0 AS total_revenue
    FROM supplier s
    JOIN rev ON rev.l_suppkey = s.s_suppkey
    WHERE rev.total_cents = (SELECT max(total_cents) FROM rev)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier (B47): the supplier(s) with the maximum
    revenue in one quarter — the view-plus-scalar-max shape (the
    original defines a VIEW and equi-selects its max; here the "view"
    is a reused DataFrame).

    Scale shape: ONE suppkey-keyed shuffle builds per-supplier
    revenue; the max is a 1-row re-aggregation broadcast back for an
    exact integer-cents equality (ties all surface, engine-stable —
    no double compare). The supplier dim joins broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _cents(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            )
        ).alias("total_cents")
    )
    mx = rev.agg(F.max("total_cents").alias("__max_cents"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_cents") == F.col("__max_cents")
    )
    return top.join(
        F.broadcast(s), top["l_suppkey"] == s["s_suppkey"]
    ).select(
        "s_suppkey",
        "s_name",
        (F.col("total_cents") / F.lit(100.0)).alias("total_revenue"),
    )


# -------------------------------------- Q16 parts/supplier relationship


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (B47, adapted: the
    part–supplier pairs come from lineitem rather than partsupp, and
    "suppliers with complaints" = negative account balance — the
    fixture has no comment text): how many distinct suppliers can
    provide each qualifying (brand, type, size) — NOT-IN exclusion
    feeding a count-distinct rollup.

    Scale shape: the exclusion list is a handful of suppkeys — a
    broadcast anti join, not a shuffle; part's brand/type/size
    predicates push to its scan and the dim broadcasts into lineitem.
    count(DISTINCT) shuffles once on the (brand,type,size,suppkey)
    expanded key, then collapses — Spark's two-phase distinct agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(bad),
            li["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
    )
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
    )


# ------------------------------------- Q17 small-quantity-order revenue


@query(
    "q_tpch_q17",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey,
               {sql_srnd("avg(l_quantity) * 0.2", 4)} AS qty_cut
        FROM lineitem GROUP BY l_partkey
    )
    SELECT sum({_sql_cents("l.l_extendedprice")}) / 100.0 / 7.0
               AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.qty_cut
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue (B47): revenue lost if
    orders below 20% of a part's average quantity were not taken —
    the correlated-average shape, decorrelated into a per-part
    aggregate joined back to the fact table.

    Determinism note: the per-part average is an unordered double
    reduction, so both engines srnd(avg × 0.2) to 4 decimals before
    the compare; fixture quantities are integral (1..50), so the
    rounded cut cannot flap a row.

    Scale shape: one part-keyed shuffle builds the averages; the
    brand-filtered part dim broadcasts; the cut compare is row-local.
    The join back to lineitem reuses the same part-keyed hash, and
    the final sum is a 1-row exact-cents partial agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        srnd(F.avg("l_quantity") * F.lit(0.2), 4).alias("qty_cut")
    )
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(pa, li["l_partkey"] == pa["pa_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return joined.agg(
        (
            F.sum(_cents(F.col("l_extendedprice")))
            / F.lit(100.0)
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


# -------------------------------------- Q2 minimum-cost supplier


@query(
    "q_tpch_q2",
    oracle=f"""
    WITH supply AS (
        SELECT l.l_partkey, l.l_suppkey, s.s_acctbal, s.s_name,
               n.n_name, p.p_name,
               min({_sql_cents("l.l_extendedprice / l.l_quantity")})
                   AS cost_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
             AND p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
             AND r.r_name = 'EUROPE'
        GROUP BY 1, 2, 3, 4, 5, 6
    )
    SELECT sp.s_acctbal, sp.s_name, sp.n_name,
           sp.l_partkey AS p_partkey, sp.p_name,
           sp.cost_cents / 100.0 AS supply_cost
    FROM supply sp
    JOIN (SELECT l_partkey, min(cost_cents) AS min_cents
          FROM supply GROUP BY l_partkey) m
         ON m.l_partkey = sp.l_partkey AND m.min_cents = sp.cost_cents
    ORDER BY sp.s_acctbal DESC, sp.n_name, sp.s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (B47, adapted: with no partsupp,
    a (part, supplier) pair's supply cost is the minimum observed
    per-unit price in lineitem, in exact cents): for mid-size STANDARD
    parts, which European supplier offers each at the lowest cost —
    the correlated-min shape, decorrelated into aggregate + self-join.

    Scale shape: the region→nation→supplier chain broadcasts into
    lineitem; ONE (part,supplier)-keyed shuffle builds the pair costs
    and the per-part min reuses the part prefix of that hash; the
    min-equality join is exact integers so ties surface in both
    engines identically. Final cut is TakeOrderedAndProject with a
    full tie-break key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD")
        & F.col("p_size").between(10, 20)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    dims = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    supply = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(dims), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(
            "l_partkey", "l_suppkey", "s_acctbal", "s_name", "n_name",
            "p_name",
        )
        .agg(
            F.min(
                _cents(F.col("l_extendedprice") / F.col("l_quantity"))
            ).alias("cost_cents")
        )
    )
    mins = supply.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("cost_cents").alias("min_cents")
    )
    best = supply.join(
        mins,
        (supply["l_partkey"] == mins["m_partkey"])
        & (supply["cost_cents"] == mins["min_cents"]),
    )
    return (
        best.orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("l_partkey"),
        )
        .limit(100)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            (F.col("cost_cents") / F.lit(100.0)).alias("supply_cost"),
        )
    )


# ---------------------------------------- Q20 potential part promotion


@query(
    "q_tpch_q20",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
         AND n.n_name = 'NATION_3'
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
             AND p.p_name LIKE 'red%'
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(CAST(floor(l.l_quantity) AS BIGINT)) > 25
    )
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (B47, adapted: "has excess
    stock of" becomes "shipped more than 25 units of" a red part in
    the year — the fixture has no partsupp availqty): suppliers in
    one nation who moved real volume of red parts — the
    IN-(grouped-HAVING-subquery) shape, i.e. a semi join whose right
    side is itself an aggregate.

    Scale shape: the name-filtered part dim broadcasts into the
    year-pruned lineitem scan; one (suppkey,partkey) shuffle builds
    the volume groups; the HAVING survivors project a distinct
    suppkey set that broadcasts into the nation-filtered supplier dim
    as a LEFT SEMI. Quantities are integral, the threshold exact.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    movers = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        # floor() both sides: DuckDB's double→BIGINT cast rounds to
        # nearest while Spark's truncates — floor-then-cast is the
        # same op sequence in both engines even for non-integral
        # quantities
        .agg(F.sum(F.floor(F.col("l_quantity")).cast("long")).alias("__qty"))
        .filter(F.col("__qty") > 25)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(movers, s["s_suppkey"] == movers["l_suppkey"], "left_semi")
        .select("s_name", "s_acctbal")
    )


# ------------------------------- Q21 suppliers who kept orders waiting


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
         AND n.n_name = 'NATION_3'
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (B47, adapted:
    "late" = shipped >60 days after the order date — the fixture has
    no commit/receipt dates): suppliers in one nation who were the
    SOLE late supplier on a finished multi-supplier order — the
    EXISTS + NOT-EXISTS double-correlation, the hardest decorrelation
    in the suite.

    Scale shape: run as one SQL statement so Catalyst plans the
    EXISTS as a LEFT SEMI and the NOT EXISTS as a LEFT ANTI, both
    order-keyed — the same shuffle key as the orders join, so AQE
    coalesces the three into one exchange family; no per-row
    re-execution anywhere. The NOT EXISTS correlates on the OUTER
    order date, carried into the anti-join condition.
    """
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "__q21_supplier"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__q21_lineitem"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "__q21_orders"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "__q21_nation"
    )
    return spark.sql(
        """
        SELECT s.s_name, count(*) AS numwait
        FROM __q21_supplier s
        JOIN __q21_lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN __q21_orders o ON o.o_orderkey = l1.l_orderkey
        JOIN __q21_nation n ON n.n_nationkey = s.s_nationkey
             AND n.n_name = 'NATION_3'
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM __q21_lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM __q21_lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
        """
    )
