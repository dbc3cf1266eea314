"""TPC-H report battery (SURVEY.md §2 B47): the classic decision-
support queries Q1/Q3/Q6/Q10/Q18 adapted to the fixture's star schema
(FIXTURES.md — no partsupp, prices are doubles, dates are timestamps).
The reference's entire purpose was running exactly this class of Hive
reports over SSTable-backed tables (SURVEY.md §0.5); this battery
proves the full relational surface end-to-end on the canonical
workload rather than operator-by-operator.

Float discipline: every revenue aggregate quantizes the per-row money
expression to integer cents BEFORE summing —
``CAST(floor(x * 100 + 0.5) AS BIGINT)`` is the same IEEE op sequence
in Spark and DuckDB, and the subsequent sum is exact integer
arithmetic, so group totals are bit-identical regardless of
partitioning or summation order (an unordered double sum over 600k
rows is NOT — SURVEY.md §5 gotchas). The final ``/ 100.0`` is a
single deterministic division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


def _cents(col: Column) -> Column:
    """Quantize a money expression to exact integer cents.

    ASSUMES NON-NEGATIVE AMOUNTS: floor(x*100 + 0.5) is round-half-UP
    for positive x but rounds half-DOWN for negative x (-1.005 →
    -101). Note raw ``c_acctbal`` IS negative on the fixtures — Q22
    applies _cents only AFTER filtering to balances above the positive
    average, so every value actually reaching _cents is > 0; the other
    call sites are price/quantity expressions that are structurally
    ≥ 0. Both engines share this exact op sequence so cross-engine
    parity holds regardless of sign — the assumption guards the
    ROUNDING CONVENTION, not parity. It is pinned loudly by
    tests/test_money_guards.py (fails if a future fixture feeds
    negative money into a _cents site); a fixture with refunds needs
    the sign-symmetric form sign(x)*floor(abs(x)*100 + 0.5) first.
    """
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def _sql_cents(expr: str) -> str:
    """DuckDB spelling of ``_cents`` (kept textually parallel;
    same non-negative-amounts assumption)."""
    return f"CAST(floor(({expr}) * 100.0 + 0.5) AS BIGINT)"


# ----------------------------------------------------- Q1 pricing summary


@query(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)    AS sum_qty,
           sum({_sql_cents("l_extendedprice")}) / 100.0       AS sum_base_price,
           sum({_sql_cents("l_extendedprice * (1.0 - l_discount)")}) / 100.0
               AS sum_disc_price,
           sum({_sql_cents(
               "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}) / 100.0
               AS sum_charge,
           floor(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / count(*) * 10000.0 + 0.5) / 10000.0        AS avg_qty,
           floor(CAST(sum({_sql_cents("l_extendedprice")}) AS DOUBLE)
                 / count(*) / 100.0 * 10000.0 + 0.5) / 10000.0 AS avg_price,
           floor(CAST(sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
                      AS DOUBLE)
                 / count(*) / 100.0 * 10000.0 + 0.5) / 10000.0 AS avg_disc,
           count(*)                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (B47): the canonical one-pass
    aggregation report — 8 aggregates over 4 groups, scanning the
    fact table once.

    Scale shape: single partial+final hash agg on a 4-value key after
    a pushed shipdate filter; every aggregate is map-side combinable
    integer arithmetic (cents/quantity quantized per-row). This is
    the query whole-stage codegen exists for — one tight JVM loop per
    partition, 4-row shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("__qty"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("__base"),
        F.sum(_cents(disc_price)).alias("__disc_price"),
        F.sum(_cents(charge)).alias("__charge"),
        F.sum(
            F.floor(F.col("l_discount") * F.lit(100.0) + F.lit(0.5)).cast(
                "long"
            )
        ).alias("__disc"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("__qty").alias("sum_qty"),
        (F.col("__base") / F.lit(100.0)).alias("sum_base_price"),
        (F.col("__disc_price") / F.lit(100.0)).alias("sum_disc_price"),
        (F.col("__charge") / F.lit(100.0)).alias("sum_charge"),
        srnd(F.col("__qty").cast("double") / F.col("count_order"), 4).alias(
            "avg_qty"
        ),
        srnd(
            F.col("__base").cast("double") / F.col("count_order") / F.lit(100.0),
            4,
        ).alias("avg_price"),
        srnd(
            F.col("__disc").cast("double") / F.col("count_order") / F.lit(100.0),
            4,
        ).alias("avg_disc"),
        "count_order",
    )


# -------------------------------------------------- Q3 shipping priority


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}) / 100.0
               AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (B47): top-10 unshipped orders by
    potential revenue for one market segment — a 3-table star join
    feeding an aggregation feeding a top-k.

    Scale shape: the segment-filtered customer side broadcasts (AQE
    sizes it); orders⋈lineitem is the one real shuffle, co-keyed on
    the order key so the revenue groupBy reuses the join's partitions;
    the cut is TakeOrderedAndProject on exact integer-cent revenue
    with an orderkey tie-break (engine-stable). Revenue ties cannot
    flap the row set across engines because cents are exact.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    joined = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    rev = joined.groupBy(
        "l_orderkey", "o_orderdate", "o_orderpriority"
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
    return (
        rev.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "o_orderdate"
            ),
            "o_orderpriority",
        )
    )


# -------------------------------------------------- Q6 revenue forecast


@query(
    "q_tpch_q6",
    oracle=f"""
    SELECT sum({_sql_cents("l_extendedprice * l_discount")}) / 100.0
               AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change (B47): a pure
    filter-and-sum — the query that measures scan + predicate
    throughput with zero join/shuffle noise.

    Scale shape: all four predicates push to the parquet scan
    (min/max row-group pruning on shipdate); the sum is a map-side
    partial over integer cents collapsing to ONE row. The discount
    BETWEEN compares the stored doubles both engines read from the
    same parquet — identical bits, identical row set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24.0)
    )
    return f.agg(
        (
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
            / F.lit(100.0)
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# --------------------------------------------- Q10 returned-item report


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}) / 100.0
               AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (B47): top-20 customers by
    revenue lost to returns in a quarter — a 4-table join with a
    customer-keyed rollup.

    Scale shape: nation broadcasts (25 rows, always); the
    orders⋈lineitem shuffle is order-keyed, then ONE customer-keyed
    shuffle serves both the customer join and the rollup; integer-cent
    revenue makes the top-20 cut exact. AQE turns the quarter-filtered
    orders side into a broadcast when it fits.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    rev = joined.groupBy(
        "c_custkey", "c_name", "c_acctbal", "n_name"
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
    return (
        rev.orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# ------------------------------------------ Q18 large-volume customers


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 180
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers (B47): orders whose total
    quantity exceeds a threshold, with their customers — the
    aggregate-then-semi-join pattern (the HAVING output drives the
    join, not the other way around).

    Scale shape: the quantity rollup is one order-keyed partial+final
    agg whose survivors (the HAVING cut) are a tiny frame that AQE
    broadcasts into the orders join; customer join reuses the
    orders-side custkey hash. Quantities are integral in the fixture,
    so the threshold and sort keys are exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    joined = big.join(o, big["l_orderkey"] == o["o_orderkey"]).join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    return (
        joined.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "o_orderdate"
            ),
            "o_totalprice",
            "total_qty",
        )
    )


# --------------------------------------- Q4 order-priority checking


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (B47, adapted: the fixture has
    no commit/receipt dates, so "late" = any line shipped >60 days
    after the order date): count a quarter's orders with at least one
    late line, per priority — the canonical EXISTS-subquery shape.

    Scale shape: Catalyst rewrites EXISTS to a LEFT SEMI join on the
    order key — each order emits at most once no matter how many lines
    are late; the date filter prunes orders before the join and the
    rollup key has 5 values (map-side combine collapses it). Runs as
    one SQL statement so the decorrelation is the planner's, not
    hand-built.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o.createOrReplaceTempView("__q4_orders")
    li.createOrReplaceTempView("__q4_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM __q4_orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM __q4_lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        """
    )


# ------------------------------------------- Q14 promotion effect


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT
        floor((100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                   THEN {_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}
                   ELSE 0 END)
               / sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}))
              * 10000.0 + 0.5) / 10000.0 AS promo_revenue_pct,
        sum(CASE WHEN p.p_type = 'PROMO'
            THEN {_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}
            ELSE 0 END) / 100.0 AS promo_revenue,
        count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect (B47): the share of one month's
    revenue earned by promotional parts — a fact⋈dim join feeding a
    conditional-aggregate ratio.

    Scale shape: the month filter prunes lineitem at the scan; part is
    the dim side (broadcast under AQE at this cardinality, hash join
    on p_partkey beyond). Both sums ride one partial agg over integer
    cents; the ratio is a single driver-free division on the 1-row
    result.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    cents = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    )
    promo_cents = F.when(F.col("p_type") == "PROMO", cents).otherwise(
        F.lit(0)
    )
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    agg = joined.agg(
        F.sum(promo_cents).alias("__promo"),
        F.sum(cents).alias("__total"),
        F.count("*").alias("n_lines"),
    )
    return agg.select(
        srnd(
            F.lit(100.0) * F.col("__promo") / F.col("__total"), 4
        ).alias("promo_revenue_pct"),
        (F.col("__promo") / F.lit(100.0)).alias("promo_revenue"),
        "n_lines",
    )


# --------------------------------------------- Q7 volume shipping


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}) / 100.0
               AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping (B47): trade volume between two
    nations by year and direction — the double-dimension join where
    the SAME dim table joins twice under different roles.

    Scale shape: both nation aliases broadcast (25 rows); the
    nation-pair disjunction prunes AFTER the cheap broadcast joins,
    so only qualifying rows reach the (supp_nation, cust_nation,
    year) rollup — 4 output rows. lineitem⋈orders is the one real
    shuffle; supplier/customer ride AQE broadcasts at this scale and
    bucket-join at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("n1_key"),
                              F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("n2_key"),
                              F.col("n_name").alias("cust_nation")))
    joined = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
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


# ---------------------------------------- Q13 customer distribution


@query(
    "q_tpch_q13",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer distribution (B47, adapted: the join filter
    excludes urgent orders instead of comment-pattern matching — the
    fixture has no comments): how many customers placed 0, 1, 2, …
    qualifying orders. The LEFT JOIN is the point: customers with no
    orders must appear in the 0 bucket, which an inner join silently
    drops.

    Scale shape: the filtered orders side shuffles on custkey once;
    the per-customer count and the distribution rollup are both
    partial-aggregable; the second groupBy key (c_count) has tiny
    cardinality, collapsing map-side.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(
        F.col("c_count").cast("long").alias("c_count")
    ).agg(F.count("*").alias("custdist"))


# ------------------------------------------ Q19 discounted revenue


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT sum({_sql_cents("l.l_extendedprice * (1.0 - l.l_discount)")}) / 100.0
               AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (B47): a disjunction of
    brand/size/quantity envelopes spanning BOTH join sides — the
    query that punishes engines that can't push mixed-side OR
    predicates into a join.

    Scale shape: Catalyst derives the single-side implications
    (brand IN (..), quantity bounds, size bounds) and pushes them to
    both scans, so the join sees pre-filtered inputs; the residual OR
    evaluates post-join row-locally. One 1-row integer-cent partial
    agg. part broadcasts under AQE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    env = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(env).agg(
        (
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                )
            )
            / F.lit(100.0)
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------- Q22 global sales opportunity


@query(
    "q_tpch_q22",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {sql_srnd("avg(c_acctbal)", 4)} AS ab
        FROM customer WHERE c_acctbal > 0.0
    ),
    eligible AS (
        SELECT substr(c.c_name, 17, 2) AS cntry, c.c_acctbal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.ab
          AND NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          )
    )
    SELECT cntry,
           CAST(count(*) AS BIGINT) AS numcust,
           sum({_sql_cents("c_acctbal")}) / 100.0 AS totacctbal
    FROM eligible GROUP BY cntry
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (B47, adapted: the "country
    code" is a slice of the customer name — the fixture has no phone
    column — and "never ordered" becomes "no order since 2000", the
    lapsed-customer reading, because every fixture customer has SOME
    order): high-balance customers gone quiet, grouped by code. Combines a scalar subquery (the global
    average) with NOT EXISTS (an anti join) — the two subquery shapes
    that stress a decorrelator together.

    Determinism note: the average balance is an unordered double
    reduction, so both engines srnd it to 4 decimals BEFORE the
    threshold compare; fixture balances carry 2 decimals and sit ~1e-7
    apart at closest, so the rounded cut cannot flap a row.

    Scale shape: the scalar average is a 1-row broadcast; NOT EXISTS
    becomes a LEFT ANTI join on custkey against order keys only
    (orders projects one column before shuffling); the rollup key is
    ~100 codes. No correlated re-execution anywhere.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        srnd(F.avg("c_acctbal"), 4).alias("ab")
    )
    eligible = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(
                F.col("o_orderdate")
                >= F.lit("2000-01-01").cast("timestamp")
            ).select("o_custkey"),
            c["c_custkey"] == o["o_custkey"],
            "left_anti",
        )
    )
    return eligible.groupBy(
        F.substring("c_name", 17, 2).alias("cntry")
    ).agg(
        F.count("*").cast("long").alias("numcust"),
        (F.sum(_cents(F.col("c_acctbal"))) / F.lit(100.0)).alias(
            "totacctbal"
        ),
    )
