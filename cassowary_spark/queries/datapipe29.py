"""Round-6 wave 31 (SURVEY.md §2): multivariate outlier screening —
per-brand bivariate Mahalanobis distance over (quantity, unit price).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

# chi-square(2 dof) 0.999 quantile: P(D^2 > 13.8155...) = 0.001 under
# bivariate normality. IDENTICAL literal on both engines.
_MAHA_T = "13.815510557964274"
_MAHA_MIN_N = 50


@query(
    "q_mahalanobis_outliers",
    oracle=f"""
    WITH pts AS (
        SELECT p.p_brand AS brand,
               CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS x,
               CAST(floor(l.l_extendedprice * 100.0
                          / l.l_quantity + 0.5) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity > 0
    ),
    s AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pts GROUP BY 1 HAVING count(*) >= {_MAHA_MIN_N}
    ),
    m AS (
        SELECT brand, n,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
               (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS vx,
               (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS vy,
               (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS cxy
        FROM s
    ),
    scored AS (
        SELECT pts.brand, m.n,
               ((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx) * vy
                - 2.0 * (CAST(x AS DOUBLE) - mx)
                      * (CAST(y AS DOUBLE) - my) * cxy
                + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my)
                  * vx)
               / nullif(vx * vy - cxy * cxy, 0.0) AS d2
        FROM pts JOIN m ON pts.brand = m.brand
    )
    SELECT brand, CAST(max(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d2 > {_MAHA_T} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           {sql_srnd("max(d2)", 6)} AS max_d2
    FROM scored GROUP BY 1
    """,
)
def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Mahalanobis outlier screen (C149): per brand, flag
    line items whose (quantity, unit price) pair sits beyond the
    χ²₂ 99.9% ellipse of the brand's own distribution — D² =
    [(x−μx)²σy² − 2(x−μx)(y−μy)σxy + (y−μy)²σx²] / (σx²σy² − σxy²),
    the closed-form 2×2 inverse. The MULTIVARIATE outlier screen:
    C115's per-column MAD misses points that are unremarkable on
    each axis but impossible JOINTLY (high quantity at a high unit
    price), which is exactly the fraud/mispricing shape. Degenerate
    brands (singular covariance) are NULL-guarded; sub-floor brands
    excluded.

    Determinism: x (integer quantity) and y (unit price quantized to
    exact cents via one fixed ratio) make all six sufficient
    statistics exact BIGINTs; every row's D² is the same fixed IEEE
    sequence from the same doubles on both engines, so the threshold
    compare cannot disagree; max_d2 is srnd-quantized.

    Scale shape: the classic TWO-PASS shape — one 25-key partial agg
    for the moments, broadcast back over the fact scan for scoring,
    then a second bounded-key agg. No sort, no corpus-sized shuffle;
    the fact table is scanned twice (the bounds table is
    broadcast-sized, so at 100 TB pass 2 pipelines map-side).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pts = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(F.col("l_quantity") > 0)
        .select(
            F.col("p_brand").alias("brand"),
            F.floor(F.col("l_quantity") + 0.5).cast("long").alias("x"),
            F.floor(
                F.col("l_extendedprice") * 100.0 / F.col("l_quantity")
                + 0.5
            )
            .cast("long")
            .alias("y"),
        )
    )
    s = (
        pts.groupBy("brand")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
        .filter(F.col("n") >= _MAHA_MIN_N)
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    m = s.select(
        "brand",
        "n",
        (sx / nd).alias("mx"),
        (sy / nd).alias("my"),
        ((F.col("sxx").cast("double") - sx * sx / nd) / (nd - 1.0)).alias(
            "vx"
        ),
        ((F.col("syy").cast("double") - sy * sy / nd) / (nd - 1.0)).alias(
            "vy"
        ),
        ((F.col("sxy").cast("double") - sx * sy / nd) / (nd - 1.0)).alias(
            "cxy"
        ),
    )
    dx = F.col("x").cast("double") - F.col("mx")
    dy = F.col("y").cast("double") - F.col("my")
    d2 = (
        dx * dx * F.col("vy")
        - 2.0 * dx * dy * F.col("cxy")
        + dy * dy * F.col("vx")
    ) / F.nullif(
        F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy"),
        F.lit(0.0),
    )
    scored = pts.join(F.broadcast(m), "brand").select(
        "brand", "n", d2.alias("d2")
    )
    thr = float(_MAHA_T)
    return scored.groupBy("brand").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.when(F.col("d2") > thr, 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        srnd(F.max("d2"), 6).alias("max_d2"),
    )
