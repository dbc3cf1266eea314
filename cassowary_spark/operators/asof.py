"""As-of join: for each fact row, the latest dim row at-or-before it.

Spark SQL has no native ASOF JOIN (SURVEY.md §2 B12). The scalable
formulation here is the union-merge: tag dim rows, union with facts,
hash-partition by key, sort by time within partition, and carry the
last non-null dim value forward with an unbounded-preceding window.

Scale notes (100 TB): exactly ONE shuffle on the join key — same cost
as a plain equi-join — versus the naive non-equi join + filter which
is a range join (quadratic per key). No driver collection; skewed keys
can be salted upstream since the window only needs per-key ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_ts: str,
    dim_ts: str,
    dim_value_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: attach the newest dim row with ts <= fact ts.

    Dim rows sort *before* fact rows at equal timestamps, so an exact
    tie is matched (inclusive <=).
    """
    on = list(on)
    tagged_dim = dim.select(
        *on,
        F.col(dim_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in dim_value_cols],
    )
    fact_cols = fact.columns
    tagged_fact = fact.select(
        *fact_cols,
        F.col(fact_ts).alias("__t"),
        F.lit(1).alias("__side"),
    )
    for c in dim_value_cols:
        tagged_fact = tagged_fact.withColumn(f"{prefix}{c}", F.lit(None).cast(dim.schema[c].dataType))
    tagged_dim = tagged_dim.select(
        *[
            F.col(c) if c in tagged_dim.columns else F.lit(None).cast(fact.schema[c].dataType).alias(c)
            for c in tagged_fact.columns
        ]
    )
    unioned = tagged_fact.unionByName(tagged_dim)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry the WHOLE dim row as one struct and take the last non-null
    # struct: per-column ignorenulls carries would skip a dim row whose
    # value is legitimately NULL (returning a stale older value) and
    # could stitch columns from DIFFERENT dim rows into one output row.
    dim_struct = F.when(
        F.col("__side") == 0,
        F.struct(*[F.col(f"{prefix}{c}").alias(c) for c in dim_value_cols]),
    )
    carried = unioned.select(
        *fact_cols,
        F.col("__side"),
        F.last(dim_struct, ignorenulls=True).over(w).alias("__dim_row"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *fact_cols,
            *[
                F.col(f"__dim_row.{c}").alias(f"{prefix}{c}")
                for c in dim_value_cols
            ],
        )
    )
