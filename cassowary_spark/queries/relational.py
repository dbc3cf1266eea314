"""Projection / filter / conditional / distinct (SURVEY.md §2 B1–B4).

The reference delegated this whole surface to Hive's operator tree
([P], reference empty); here each is a direct Catalyst-planned
DataFrame expression — filters and projections collapse into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table


@query(
    "q_project",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                 AS name_upper,
           floor((c_acctbal * 1.1) * 10000.0 + 0.5) / 10000.0     AS acctbal_bumped,
           c_nationkey + 100             AS shifted_nation,
           'cust'                        AS tag
    FROM customer
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with expressions, aliases, and literals (B1)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        srnd(F.col("c_acctbal") * 1.1, 4).alias("acctbal_bumped"),
        (F.col("c_nationkey") + 100).alias("shifted_nation"),
        F.lit("cust").alias("tag"),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 200000
      AND o_orderstatus IN ('F', 'O')
      AND o_orderpriority LIKE '%URGENT%'
      AND regexp_matches(o_orderpriority, '^[0-9]-')
      AND o_custkey IS NOT NULL
      AND (o_orderkey % 2 = 0 OR o_totalprice > 50000)
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery: BETWEEN/IN/LIKE/RLIKE/IS NULL/boolean (B2)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_orderpriority").rlike("^[0-9]-")
        & F.col("o_custkey").isNotNull()
        & ((F.col("o_orderkey") % 2 == 0) | (F.col("o_totalprice") > 50000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q_case_when",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_acctbal >= 750 THEN 'high'
                WHEN s_acctbal >= 250 THEN 'mid'
                ELSE 'low' END                       AS bal_band,
           coalesce(nullif(s_name, ''), 'unknown')   AS name_safe,
           greatest(s_acctbal, 100.0)                AS bal_floor,
           least(s_acctbal, 900.0)                   AS bal_cap,
           CASE WHEN s_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS nation_parity
    FROM supplier
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals: CASE WHEN / COALESCE / NULLIF / GREATEST / LEAST (B3)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.when(F.col("s_acctbal") >= 750, "high")
        .when(F.col("s_acctbal") >= 250, "mid")
        .otherwise("low")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias("name_safe"),
        F.greatest(F.col("s_acctbal"), F.lit(100.0)).alias("bal_floor"),
        F.least(F.col("s_acctbal"), F.lit(900.0)).alias("bal_cap"),
        F.when(F.col("s_nationkey") % 2 == 0, "even").otherwise("odd").alias("nation_parity"),
    )


@query(
    "q_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (B4) — partial-agg dedup before the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "q_sql_report",
    oracle="""
    SELECT n.n_name,
           CAST(floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) AS DOUBLE) / 100.0 AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_sql_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL surface (the HiveQL role Shark played): a TPC-H-Q5-ish
    six-table report submitted as one ``spark.sql`` string over
    registered temp views — proof the engine's whole relational
    surface is reachable without the DataFrame API.

    Catalyst plans it identically to the DataFrame twin: region/nation
    broadcast, the fact-side joins shuffle on their keys, AQE reorders
    and broadcast-converts the post-filter orders side when small.
    """
    for t in ["region", "nation", "customer", "orders", "lineitem", "supplier"]:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name,
               CAST(floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) AS DOUBLE) / 100.0 AS revenue,
               count(*) AS n_items
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        """
    )


@query(
    "q_cluster_by",
    oracle="""
    SELECT user_id, event_id, rn FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
)
def q_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY / SORT BY (B27) — Hive's repartition + per-partition
    sort surface, submitted as SQL: cluster events by user_id with rows
    time-ordered inside each partition, then take each user's first 3
    events via row_number.

    Scale note: the window's PARTITION BY user_id reuses the exchange
    introduced by DISTRIBUTE BY user_id — one shuffle total, and the
    SORT BY feeds the window's required ordering. The deterministic
    row_number projection (ties broken by event_id) makes an otherwise
    physical-layout-only operator oracle-checkable; the shuffle-free
    bucketed-join side of B27 stays plan-audited in tests/test_plans.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH clustered AS (
            SELECT user_id, event_id, ts FROM events
            DISTRIBUTE BY user_id SORT BY user_id, ts, event_id
        )
        SELECT user_id, event_id, rn FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM clustered
        ) WHERE rn <= 3
        """
    )


_SUBQUERY_SQL = """
    SELECT o.o_orderpriority,
           count(*) AS n_big_orders
    FROM orders o
    WHERE o.o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      AND o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    GROUP BY o.o_orderpriority
"""


@query("q_subquery", oracle=_SUBQUERY_SQL)
def q_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar, correlated-EXISTS, and IN subqueries in one statement —
    the decorrelation surface (B14-ish; Catalyst rewrites them to a
    scalar-agg cross join plus left-semi joins).

    Identical SQL text runs on both engines. Plan shape at scale: the
    scalar avg is a 1-row broadcast; EXISTS/IN become semi-joins that
    shuffle on their equi-keys (AQE broadcasts the post-filter
    customer side when small). The avg predicate compares unrounded
    doubles, safe because order prices are cents-quantized — no value
    sits within float-error distance of the mean.
    """
    for t in ["orders", "lineitem", "customer"]:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SUBQUERY_SQL)


@query(
    "q_unpivot",
    oracle="""
    WITH agg AS (
        SELECT o_orderstatus,
               floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS sum_price,
               CAST(count(*) AS DOUBLE) AS n_orders
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'sum_price' AS measure, sum_price AS amount FROM agg
    UNION ALL
    SELECT o_orderstatus, 'n_orders' AS measure, n_orders AS amount FROM agg
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (B4-adjacent): wide per-status measures to long
    (status, measure, amount) form — `DataFrame.unpivot`, the inverse
    of `q_pivot`. The melt is a row-local generate (no shuffle beyond
    the feeding agg); the oracle spells it as UNION ALL, which is the
    same logical expansion.
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        srnd(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count("*").cast("double").alias("n_orders"),
    )
    return agg.unpivot(
        ["o_orderstatus"], ["sum_price", "n_orders"], "measure", "amount"
    )
