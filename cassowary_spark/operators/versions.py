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
    tomb = tombstones.groupBy(*keys).agg(F.max(tts).alias("__tomb_ts"))
    cond = None
    for k in keys:
        c = df[k] == tomb[k]
        cond = c if cond is None else (cond & c)
    joined = df.join(F.broadcast(tomb), cond, "left")
    survived = joined.filter(
        F.col("__tomb_ts").isNull() | (F.col(ts_col) > F.col("__tomb_ts"))
    )
    return survived.drop("__tomb_ts").drop(*[tomb[k] for k in keys])


def ttl_expire(df: DataFrame, ts_col: str, ttl_col: Column, now: Column) -> DataFrame:
    """Expiring-cell semantics: a row older than its TTL acts deleted."""
    return df.filter(F.col(ts_col) + ttl_col > now)
