"""Exact midranks from value counts — the 100 TB form of rank().

``rank() OVER (ORDER BY x)`` (and the doubled-average-rank identity
2·ar = 2·min_rank + tie_count − 1 built on it) is exact but ranks
EVERY row in one totally-ordered window: an unpartitioned WindowExec
whose single task sees the whole frame — the scale-killer plan shape
for a corpus-sized input. Rank-SUM statistics (Mann-Whitney U,
Kruskal-Wallis H, Spearman ρ over midranks) never need per-row ranks,
though: they only need, per distinct value x, the tie count cnt(x)
and the doubled average rank

    u2(x) = 2·cum(x) − cnt(x) + 1,    cum(x) = Σ_{y ≤ x} cnt(y)

because every row tied at x contributes the same u2(x), so every
rank sum is Σ_x cnt_g(x)·u2(x) — an exact BIGINT identical to the
row-ranked form, bit for bit.

The production shape this module gives:

1. ONE map-side-combining ``groupBy(value)`` collapses the corpus to
   its distinct-value frame (quantized domains — integer cents, char
   counts — bound its cardinality regardless of row count);
2. ONE running-sum window over THAT frame computes cum(x) → u2(x).
   The window is still unpartitioned, but it orders distinct values,
   not rows: domain-bounded work (≤ ~10⁵ rows for cents-quantized
   metrics), the same accepted class as the calendar/catalog frames
   elsewhere in the repo. At true unbounded domains, range-partition
   the counts frame and two-pass the running sum (per-partition
   totals broadcast, offsets added) — the standard distributed
   prefix-sum; the fixtures never need it;
3. rank sums become plain aggregates (or small equi-joins for
   multi-variable statistics) over the counts frame — no corpus-wide
   sort or window ever exists in the plan.

Agreement with the row-ranked form is EXACT (integer identity, not a
sketch): tests/test_ranks.py pins bit-equality against literal
``rank()`` plans on fixtures and randomized inputs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doubled_midranks(
    counts: DataFrame,
    value_col: str,
    cnt_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "u2",
    cum_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = doubled average rank to a per-(group, value)
    counts frame.

    ``counts`` must hold ONE row per (group, value) with ``cnt_col``
    the number of original rows at that value (BIGINT). Ranks are
    within each ``group_cols`` partition (global when empty), ordered
    by ``value_col`` ascending — the doubled-average-rank identity
    2·ar = 2·min_rank + cnt − 1 = 2·cum − cnt + 1 keeps the result an
    exact BIGINT, so Σ cnt·u2-style rank sums are bit-identical to
    ranking the un-collapsed rows.

    The running-sum window is over the counts frame only (distinct
    values per group) — never the original rows. Callers own the
    guarantee that the value domain is bounded (quantized metrics);
    see the module docstring for the unbounded-domain evolution.

    ``cum_col`` additionally exposes the inclusive cumulative count
    cum(x) — consumers that also need positional cut arithmetic
    (top-decile membership, weighted-quantile thresholds) read it
    from the same window instead of re-deriving (u2 + cnt − 1)/2.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(cnt_col)).over(w)
    cols = [
        counts["*"],
        (2 * cum - F.col(cnt_col) + 1).cast("long").alias(out_col),
    ]
    if cum_col is not None:
        # the window sum itself, not a float re-derivation from u2 —
        # exact BIGINT at any magnitude (both columns share the one
        # WindowExec)
        cols.append(cum.cast("long").alias(cum_col))
    return counts.select(*cols)


def attach_doubled_midranks(
    cells: DataFrame,
    value_col: str,
    cnt_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "u2",
) -> DataFrame:
    """Attach POOLED doubled midranks to a cells frame that may hold
    MULTIPLE rows per (group, value) — e.g. per-(arm, value) or
    per-(x, y) joint cells whose ranks must pool across the other
    key. The join-free sibling of ``doubled_midranks``:

    - ``rangeBetween(unboundedPreceding, 0)`` makes the running sum
      VALUE-framed, so every row at value x sees cum(x) = Σ_{y ≤ x}
      over ALL rows (its whole tie group included), and
    - a value-partitioned sum supplies the pooled tie count,

    giving u2 = 2·cum − tie + 1 per row with zero joins and zero
    extra frames — two window functions over the SAME domain-bounded
    cells frame. The tie partition (group, value) is a prefix-
    compatible refinement of the cum sort (group, value-ordered), so
    both WindowExec nodes share ONE exchange + sort (verified:
    q_spearman_corr runs two attach calls in 2 exchanges total).
    Exact BIGINT, same identity as ``doubled_midranks``.
    """
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wval = Window.partitionBy(*group_cols, value_col)
    cum = F.sum(F.col(cnt_col)).over(wcum)
    tie = F.sum(F.col(cnt_col)).over(wval)
    return cells.withColumn(out_col, (2 * cum - tie + 1).cast("long"))


def counts_bands(
    cells: DataFrame,
    value_col: str,
    cnt_col: str,
    n_bands: int,
    *,
    descending: bool = False,
    group_cols: Sequence[str] = (),
    out_col: str = "band",
) -> DataFrame:
    """Ties-together equi-depth banding over a cells frame — the
    scale-safe exact sibling of ``ntile(B)``.

    ``ntile`` splits tied values across band boundaries by row
    position, which (a) needs a corpus-wide totally-ordered window
    and (b) makes the cut depend on an arbitrary tiebreak column.
    This banding keeps every tie group whole: a cell (one row per
    (group, value), or several — ties pool via the RANGE frame) is
    assigned

        band = 1 + ((cum − 1) · B) div N

    where cum is the inclusive cumulative count through the END of
    the value's tie group (RANGE frame pools peers) and N the
    partition total. Bands are 1..B, monotone in the value order,
    each within one tie-group's mass of N/B — the classic equi-depth
    histogram with ties-together semantics (what ANALYZE-style
    equi-height histograms store). The window runs over the CELLS
    frame (distinct values — domain-bounded for quantized metrics),
    never the corpus: sp_corpus_windows = 0 by construction.

    Exactness: cum, N are BIGINTs; (cum−1)·B is computed in BIGINT
    and divided exactly via the subtract-remainder identity
    (a − a mod n)/n — the float division is a multiple of its
    divisor with a small quotient, so IEEE rounds it exactly; no
    floor-of-near-integer hazard. The matching ANSI form is
    ``1 + ((cum - 1) * B) // tot``.
    """
    order = (
        F.col(value_col).desc() if descending else F.col(value_col).asc()
    )
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(order)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*group_cols)
    cum = F.sum(F.col(cnt_col)).over(wcum).cast("long")
    tot = F.sum(F.col(cnt_col)).over(wtot).cast("long")
    num = (cum - 1) * F.lit(n_bands).cast("long")
    band = F.lit(1) + (num - F.pmod(num, tot)) / tot
    return cells.withColumn(out_col, band.cast("int"))


def tie_correction(
    counts: DataFrame,
    cnt_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "tsum",
) -> DataFrame:
    """Σ(t³ − t) over tie groups — the shared correction term of the
    tie-adjusted Mann-Whitney variance and Kruskal-Wallis H.

    Input is the SAME per-(group, value) counts frame
    ``doubled_midranks`` consumes (one scan serves both), so the tie
    sum costs one more partial agg, not a second corpus pass. Returns
    one row per group (one row total when ``group_cols`` is empty)
    with an exact BIGINT ``out_col``; groups whose values are all
    distinct yield 0, and an EMPTY counts frame yields a single
    0-row only in the ungrouped form (grouped: no row, as SQL aggs
    do).
    """
    t = F.col(cnt_col)
    term = F.when(t > 1, t * t * t - t).otherwise(F.lit(0))
    if group_cols:
        return counts.groupBy(*group_cols).agg(
            F.sum(term).cast("long").alias(out_col)
        )
    return counts.agg(
        F.coalesce(F.sum(term), F.lit(0)).cast("long").alias(out_col)
    )


def catalog_positions(
    frame: DataFrame,
    order_cols: Sequence,
    out_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Attach ``out_col`` = 1-based position under a STRICT total
    order — ``row_number()`` over a frame the caller guarantees is
    catalog/domain-bounded (a per-key aggregate, never raw corpus
    rows; the plan-budget ratchet's sp_corpus_windows=0 enforces the
    contract repo-wide).

    This is the leaderboard complement of ``doubled_midranks``:
    midranks serve rank-SUM statistics (ties pool), positions serve
    rank-DIFF views (movers, top-k cuts) where ``order_cols`` must
    already break every tie (e.g. (metric DESC, key ASC)) so the
    position is engine-deterministic. Centralizing it here keeps the
    bounded-window discipline in one reviewed place instead of ad-hoc
    Window definitions per query; at true unbounded domains the same
    two-pass range-partitioned evolution as the module docstring
    applies.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return frame.withColumn(out_col, F.row_number().over(w).cast("long"))
