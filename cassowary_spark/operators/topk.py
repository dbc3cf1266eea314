"""Top-k per group.

Scale notes: row_number + filter shuffles each group once and sorts
within partitions. Spark's WindowGroupLimit physical optimization
(Spark 3.5+) pushes the k-limit below the shuffle, so each map task
only emits k rows per group it sees — the 100 TB-safe formulation.
The ordering must be total (include a unique tiebreaker) or results
are nondeterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
