"""Approximate-quantile bucketing — the 100 TB form of ntile.

``ntile(n) OVER (ORDER BY metric)`` is exact but needs a GLOBAL sort:
every row shuffles into one totally-ordered range partitioning, and
tied-value splitting additionally serializes on row position. That is
the B26 cost class — acceptable for demonstration queries whose
oracle must be bit-checkable, but the wrong shape for a 10⁹-row
frame. The production form computed here instead:

1. ONE pass of ``approx_percentile`` (a mergeable KLL-style sketch:
   partial per partition, merged at the driver — no row shuffle at
   all) yields the n-1 bucket thresholds as a 1-row frame;
2. the thresholds broadcast (< 1 KB) and bucketing becomes a
   ROW-LOCAL threshold scan — no window, no sort, no exchange beyond
   the sketch's own partial-agg collect.

Agreement with exact ntile: identical up to (a) sketch error on the
threshold positions (bounded by ``accuracy``: max rank error is
~1/accuracy of the row count) and (b) tied metric values, which
approx bucketing keeps together while ntile splits by position. Both
effects move only rows adjacent to a boundary; the property suite
(tests/test_quantiles.py) pins per-bucket mass within tolerance on
the fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_approx_ntiles(
    df: DataFrame,
    specs: list[tuple[str, Column | str, int]],
    accuracy: int = 10_000,
) -> DataFrame:
    """Add one approx-ntile bucket column per ``(out_col, metric, n)``.

    ``metric`` is an ascending-order column/expression (bucket 1 = the
    smallest values, matching ``ntile(n) OVER (ORDER BY metric ASC)``;
    for a DESC ntile pass the negated metric). All requested threshold
    arrays come from a SINGLE aggregate over ``df`` — one job, one
    1-row broadcast — so RFM-style multi-metric scoring still costs
    one sketch pass.

    Buckets are ``1 + #{thresholds strictly below the value}``: every
    value lands in exactly one bucket, NULL metrics yield NULL
    buckets (ntile would rank them; callers that keep NULLs should
    filter or coalesce first, and the fixtures never produce them).

    SKIPPED BUCKET IDS UNDER HEAVY TIES: when more than 1/n of the
    mass sits at a single value, percentile_approx returns that value
    for SEVERAL consecutive thresholds, and the strictly-greater count
    then jumps past the duplicated positions — e.g. with thresholds
    [5, 5, 5, 9] the occupied buckets are {1, 4, 5}; ids 2 and 3 are
    EMPTY, never emitted. Tied rows stay together (the documented
    divergence from ntile's positional split), but consumers that
    assume contiguous 1..n labels — RFM segment strings, decile
    charts, per-bucket joins against a literal 1..n frame — must
    treat bucket ids as a SUBSET of 1..n, not a partition into
    exactly n parts. Pinned by
    tests/test_quantiles.py::test_heavy_ties_skip_bucket_ids.
    """
    if not specs:
        raise ValueError("with_approx_ntiles: empty spec list")
    agg_cols = []
    for out, metric, n in specs:
        if n < 2:
            raise ValueError(f"with_approx_ntiles: n must be >= 2 for {out!r}")
        m = F.col(metric) if isinstance(metric, str) else metric
        qs = [i / n for i in range(1, n)]
        agg_cols.append(
            F.percentile_approx(m.cast("double"), qs, accuracy).alias(f"__th_{out}")
        )
    th = df.agg(*agg_cols)
    out_df = df.crossJoin(F.broadcast(th))
    for out, metric, n in specs:
        m = F.col(metric) if isinstance(metric, str) else metric
        mv = m.cast("double")
        bucket = F.lit(1) + F.aggregate(
            F.col(f"__th_{out}"),
            F.lit(0),
            lambda acc, t: acc + F.when(mv > t, 1).otherwise(0),
        )
        # NULL > t is NULL → otherwise(0) would silently file NULL
        # metrics in bucket 1; propagate NULL instead (documented)
        out_df = out_df.withColumn(
            out, F.when(mv.isNull(), F.lit(None)).otherwise(bucket).cast("int")
        )
    return out_df.drop(*[f"__th_{out}" for out, _, _ in specs])
