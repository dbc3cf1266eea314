"""Round-6 wave 27 (SURVEY.md §2): model-monitoring drift — the
population stability index (PSI) of the order-value distribution
between two periods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.exprs import sql_srnd, srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table

_PSI_BIN_W = 50_000.0  # fixed $ bin width
_PSI_BINS = 10  # bins 0..9, top bin open-ended
_PSI_YEAR_A, _PSI_YEAR_B = 1996, 1997


@query(
    "q_psi",
    oracle=f"""
    WITH binned AS (
        SELECT least(CAST(floor(o_totalprice / {_PSI_BIN_W}) AS BIGINT),
                     {_PSI_BINS - 1}) AS bin,
               CAST(sum(CASE WHEN year(o_orderdate) = {_PSI_YEAR_A}
                        THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN year(o_orderdate) = {_PSI_YEAR_B}
                        THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM orders
        WHERE year(o_orderdate) IN ({_PSI_YEAR_A}, {_PSI_YEAR_B})
        GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb FROM binned),
    terms AS (
        SELECT bin, ca, cb,
               {sql_srnd(
                   "((CAST(ca AS DOUBLE) + 0.5)"
                   "  / (CAST(na AS DOUBLE) + 5.0)"
                   " - (CAST(cb AS DOUBLE) + 0.5)"
                   "  / (CAST(nb AS DOUBLE) + 5.0))"
                   " * ln(((CAST(ca AS DOUBLE) + 0.5)"
                   "       * (CAST(nb AS DOUBLE) + 5.0))"
                   "      / ((CAST(cb AS DOUBLE) + 0.5)"
                   "       * (CAST(na AS DOUBLE) + 5.0)))", 8)} AS term
        FROM binned CROSS JOIN tot
    )
    SELECT bin, ca, cb, term,
           {sql_srnd(
               "(SELECT list_sum(list(term ORDER BY bin)) FROM terms)",
               6)} AS psi_total
    FROM terms
    """,
)
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index (C142): PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ)
    of the order-value distribution across fixed $50k bins between
    1996 and 1997 — the industry-standard "has the population my
    model scores shifted" monitor (rule of thumb: <0.1 stable, >0.25
    retrain), the SYMMETRIC binned sibling of C136's KL (direction-
    free) and C112's KS (which maximizes one gap; PSI integrates all
    of them). Cells are smoothed +0.5 (denominators +B/2) so a bin
    empty on one side never hits ln(0) — smoothing applied
    identically to both periods keeps identical distributions at
    PSI exactly 0.

    Determinism: bin counts are exact BIGINTs from a fixed integer
    binning (floor(value/50k) capped at 9); each of the ≤10 terms is
    one fixed IEEE sequence ending in one ln, srnd8-quantized before
    the bounded sum.

    Scale shape: ONE bounded-key (≤10 bins) conditional partial agg
    with the year predicate at the scan — map-side combine carries
    10 (ca, cb) pairs per mapper; everything after is arithmetic
    over ≤10 rows, and the total rides the same rows (no second
    scan).
    """
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    binned = (
        o.filter(yr.isin(_PSI_YEAR_A, _PSI_YEAR_B))
        .groupBy(
            F.least(
                F.floor(F.col("o_totalprice") / _PSI_BIN_W).cast("long"),
                F.lit(_PSI_BINS - 1).cast("long"),
            ).alias("bin")
        )
        .agg(
            F.sum(F.when(yr == _PSI_YEAR_A, 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(yr == _PSI_YEAR_B, 1).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
    )
    # r14: totals, the srnd8 per-bin terms and the PSI fold all run
    # row-locally over the packed ≤10-bin array in ONE 1-row
    # aggregate, then the per-bin rows explode back (was: persisted
    # bin frame + totals broadcast + fold job + final crossJoin).
    # The fold keeps BIN order (the C69 idiom — sorted array): a
    # plain sum()'s engine-dependent fold order can differ by 1 ulp
    # and flip the srnd6 boundary (hypothesis found the q_psi case;
    # the sf0.1 sweep found the q_kl_divergence one).
    h = f"{_PSI_BINS / 2.0!r}"
    term = (
        "floor((((CAST(x.ca AS DOUBLE) + 0.5)"
        f" / (CAST(na AS DOUBLE) + {h})"
        " - (CAST(x.cb AS DOUBLE) + 0.5)"
        f" / (CAST(nb AS DOUBLE) + {h}))"
        " * ln(((CAST(x.ca AS DOUBLE) + 0.5)"
        f" * (CAST(nb AS DOUBLE) + {h}))"
        " / ((CAST(x.cb AS DOUBLE) + 0.5)"
        f" * (CAST(na AS DOUBLE) + {h}))))"
        " * 1.0E8 + 0.5) / 1.0E8"
    )
    packed = binned.agg(
        F.expr("array_sort(collect_list(struct(bin, ca, cb)))").alias("cls")
    ).select(
        "cls",
        F.expr("aggregate(cls, 0L, (a, x) -> a + x.ca)").alias("na"),
        F.expr("aggregate(cls, 0L, (a, x) -> a + x.cb)").alias("nb"),
    ).select(
        F.expr(
            "transform(cls, x -> struct(x.bin AS bin, x.ca AS ca,"
            f" x.cb AS cb, {term} AS term))"
        ).alias("terms"),
    ).select(
        "terms",
        F.expr(
            "aggregate(terms, CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x.term)"
        ).alias("t"),
    )
    return packed.select(F.explode("terms").alias("x"), "t").select(
        F.col("x.bin").alias("bin"),
        F.col("x.ca").alias("ca"),
        F.col("x.cb").alias("cb"),
        F.col("x.term").alias("term"),
        srnd(F.col("t"), 6).alias("psi_total"),
    )
