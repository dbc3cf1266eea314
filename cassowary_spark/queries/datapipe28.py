"""Round-6 wave 30 (SURVEY.md §2): index-number economics — the
Laspeyres / Paasche / Fisher price index between two years.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

_PI_Y0, _PI_Y1 = 1996, 1997


@query(
    "q_price_index",
    oracle=f"""
    WITH per AS (
        SELECT l_partkey AS pk, year(l_shipdate) AS yr,
               CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS cents,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                    AS BIGINT) AS qty
        FROM lineitem WHERE year(l_shipdate) IN ({_PI_Y0}, {_PI_Y1})
        GROUP BY 1, 2 HAVING sum(CAST(floor(l_quantity + 0.5)
                                      AS BIGINT)) > 0
    ),
    matched AS (
        SELECT a.pk,
               CAST(floor(CAST(a.cents AS DOUBLE) * 100.0
                          / CAST(a.qty AS DOUBLE) + 0.5) AS BIGINT)
                   AS p0_4,
               CAST(floor(CAST(b.cents AS DOUBLE) * 100.0
                          / CAST(b.qty AS DOUBLE) + 0.5) AS BIGINT)
                   AS p1_4,
               a.qty AS q0, b.qty AS q1
        FROM per a JOIN per b ON a.pk = b.pk
        WHERE a.yr = {_PI_Y0} AND b.yr = {_PI_Y1}
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(p1_4 * q0) AS BIGINT) AS l_num,
               CAST(sum(p0_4 * q0) AS BIGINT) AS l_den,
               CAST(sum(p1_4 * q1) AS BIGINT) AS p_num,
               CAST(sum(p0_4 * q1) AS BIGINT) AS p_den
        FROM matched
    )
    SELECT n_parts,
           {sql_srnd(
               "CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE)",
               6)} AS laspeyres,
           {sql_srnd(
               "CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE)",
               6)} AS paasche,
           {sql_srnd(
               "sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))"
               " * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE)))",
               6)} AS fisher
    FROM s
    """,
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price index (C148): aggregate
    price change from {_PI_Y0} to {_PI_Y1} over parts traded in BOTH
    years — Laspeyres weights by base-year quantities (what last
    year's basket costs now), Paasche by current-year quantities,
    Fisher is their geometric mean (the "ideal" index satisfying the
    time-reversal test). The index-number counterpart of C102's PVM
    bridge: the bridge decomposes a revenue delta, the index states
    pure price level change with quantity weights held fixed.

    Determinism: per-(part, year) unit prices are quantized to exact
    1e-4-dollar BIGINTs (one fixed ratio then floor — the C130
    quantize-then-sum discipline), quantities to exact integers, so
    all four index sums are order-free BIGINT sums (headroom: p4 ≤
    ~1e8 × q ≤ ~1e5 × 20k parts ≈ 2e17 < 2^63); the two divisions
    and one sqrt are a fixed IEEE sequence.

    Scale shape: ONE (part × year)-bounded partial agg with the year
    predicate at the scan; the both-years join is part-keyed over
    year-split halves of that SMALL aggregate (catalog-sized, never
    fact-sized); the index is a 1-row reduce.
    """
    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    qtyi = F.floor(F.col("l_quantity") + 0.5).cast("long")
    per = (
        li.filter(yr.isin(_PI_Y0, _PI_Y1))
        .groupBy(F.col("l_partkey").alias("pk"), yr.alias("yr"))
        .agg(
            F.sum(cents).alias("cents"),
            F.sum(qtyi).alias("qty"),
        )
        .filter(F.col("qty") > 0)
    )
    p4 = F.floor(
        F.col("cents").cast("double") * 100.0 / F.col("qty").cast("double")
        + 0.5
    ).cast("long")
    a = per.filter(F.col("yr") == _PI_Y0).select(
        "pk", p4.alias("p0_4"), F.col("qty").alias("q0")
    )
    b = per.filter(F.col("yr") == _PI_Y1).select(
        "pk", p4.alias("p1_4"), F.col("qty").alias("q1")
    )
    both = a.join(b, "pk")
    s = both.agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum(F.col("p1_4") * F.col("q0")).cast("long").alias("l_num"),
        F.sum(F.col("p0_4") * F.col("q0")).cast("long").alias("l_den"),
        F.sum(F.col("p1_4") * F.col("q1")).cast("long").alias("p_num"),
        F.sum(F.col("p0_4") * F.col("q1")).cast("long").alias("p_den"),
    )
    lx = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    px = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return s.select(
        "n_parts",
        srnd(lx, 6).alias("laspeyres"),
        srnd(px, 6).alias("paasche"),
        srnd(F.sqrt(lx * px), 6).alias("fisher"),
    )
