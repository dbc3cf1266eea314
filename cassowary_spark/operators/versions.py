"""Cassandra-semantics operators: multi-version merge + tombstones.

The reference's SSTable reader merges the same row across N SSTables,
keeps the highest-timestamp cell, and suppresses tombstoned/expired
cells (SURVEY.md §2 A2/A3, reconstruction — reference empty, [P]).
Here the same semantics are engine operators over any keyed, timestamped
DataFrame; the SSTable DataSource applies them at scan time.

Scale notes (100 TB): both operators are a single hash-partition by
key — no driver collection, no cartesian. ``latest_version`` is one
shuffle on the key (window dedup); ``suppress_tombstones`` reduces the
tombstone set to max-ts-per-key first (map-side partial agg), so the
join side that shuffles is the already-small tombstone summary, and it
broadcasts when small enough.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_version(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Last-write-wins per key: keep the highest-``ts_col`` row.

    Equivalent of the SSTable multi-version reconcile (A2): the same
    logical row in many SSTables resolves to its newest cell values.
    ``tiebreakers`` make the pick total when timestamps can tie.
    """
    order = [F.col(ts_col).desc()] + [F.col(t).desc() for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def suppress_tombstones(
    df: DataFrame,
    tombstones: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tombstone_ts_col: str | None = None,
) -> DataFrame:
    """Drop rows at-or-below the newest tombstone for their key (A3).

    Cassandra semantics: a tombstone with timestamp T deletes every
    cell of that key with timestamp <= T; newer writes survive.
    """
    tts = tombstone_ts_col or ts_col
    # Reduce tombstones to one max-ts row per key (partial agg map-side,
    # tiny result → broadcastable), then a single equi-join + filter.
    # No broadcast hint: AQE broadcasts the summary when it is small;
    # a hint would PIN a billion-key tombstone set as a broadcast
    # relation and OOM at exactly the scale this module targets.
    tomb = tombstones.groupBy(*keys).agg(F.max(tts).alias("__tomb_ts"))
    cond = None
    for k in keys:
        c = df[k] == tomb[k]
        cond = c if cond is None else (cond & c)
    joined = df.join(tomb, cond, "left")
    survived = joined.filter(
        F.col("__tomb_ts").isNull() | (F.col(ts_col) > F.col("__tomb_ts"))
    )
    return survived.drop("__tomb_ts").drop(*[tomb[k] for k in keys])


def ttl_expire(df: DataFrame, ts_col: str, ttl_col: Column, now: Column) -> DataFrame:
    """Expiring-cell semantics: a row older than its TTL acts deleted.
    NULL TTL = no TTL = never expires (Cassandra's default) — without
    the isNull arm the three-valued predicate silently deletes every
    non-expiring row."""
    return df.filter(ttl_col.isNull() | (F.col(ts_col) + ttl_col > now))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """CDC between two snapshot views (A11): classify every key as
    ``insert`` (only in ``new``), ``delete`` (only in ``old``) or
    ``update`` (present in both with any value column changed);
    unchanged keys are dropped. With the SSTable source's generation
    time travel (``max_gen``), this turns the log-structured storage's
    immutable generations into a change feed — CDC without a change
    log, because the generations ARE the log.

    Output: key columns, the surviving side's value columns (new side
    for insert/update, old side for delete), and ``change``.

    Scale notes (100 TB): both inputs arrive generation-pruned from
    split planning (strictly cheaper than full reads); the full-outer
    join is ONE co-partitioned shuffle on the key, and value
    comparison is a row-local null-safe predicate — no window, no
    second pass. When diffing adjacent generations, the old side is
    usually the small delta and AQE broadcast-converts it.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__ov_{c}") for c in value_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__nv_{c}") for c in value_cols],
    )
    cond = None
    for k in keys:
        c = o[f"__ok_{k}"] == n[f"__nk_{k}"]
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    changed = None
    for c in value_cols:
        d = ~F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))
        changed = d if changed is None else (changed | d)
    change = (
        F.when(F.col(f"__ok_{keys[0]}").isNull(), F.lit("insert"))
        .when(F.col(f"__nk_{keys[0]}").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out = j.withColumn("change", change).filter(F.col("change").isNotNull())
    sel = [
        F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col("change") == "delete", F.col(f"__ov_{c}"))
        .otherwise(F.col(f"__nv_{c}"))
        .alias(c)
        for c in value_cols
    ]
    return out.select(*sel, "change")
