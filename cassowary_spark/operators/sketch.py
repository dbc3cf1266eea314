"""Count-min sketch over a token stream — pure JVM expressions.

The sketch is a ``depth × width`` grid of counters. Every token
increments one counter per row (bucket = ``xxhash64(term, row) %
width``); a term's estimate is the min of its ``depth`` counters.
Estimates never undercount (collisions only add), so a threshold scan
over the sketch has no false negatives — the property the two-pass
heavy-hitter query relies on.

Scale shape: building the sketch is one groupBy keyed by
``(row, bucket)`` whose post-combine cardinality is the fixed
``depth·width`` (8K cells here) regardless of corpus size — compare a
full term-count shuffle whose cardinality is the vocabulary (10^8+
terms for web-scale corpora). The sketch then rides a broadcast join
to wherever estimates are needed. Everything is built-in expressions:
no UDFs, fully whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _probe_cells(term_col: str, depth: int, width: int) -> F.Column:
    """Array of (row, bucket) cells a term hashes into."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.col(term_col), F.lit(i)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    tokens: DataFrame,
    term_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: one fixed-cardinality groupBy over the stream.

    Returns ``(row, bucket, cnt)`` with at most depth·width rows —
    broadcastable by construction at any corpus size.
    """
    cells = tokens.select(
        F.explode(_probe_cells(term_col, depth, width)).alias("__c")
    ).select(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
    return cells.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    terms: DataFrame,
    sketch: DataFrame,
    term_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each term: min over its depth counters.

    The sketch side is explicitly broadcast (≤ depth·width rows), so
    the probe never shuffles the term set.
    """
    probes = terms.select(
        F.col(term_col), F.explode(_probe_cells(term_col, depth, width)).alias("__c")
    ).select(term_col, F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
    # LEFT join + coalesce: an untouched counter cell is an implicit
    # ZERO — an inner join would exclude it from the min (inflating the
    # estimate) and drop all-absent terms entirely instead of est=0.
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
