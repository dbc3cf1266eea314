"""Cassowary-native scan-path queries (SURVEY.md §2 group A).

The reference's storage layer scans SSTable snapshots, merges
multi-version rows, and suppresses tombstones before handing rows to
Hive (reconstruction [P]; reference checkout empty — SURVEY.md §0).
Here the scan path is Spark's parquet source (SSTable DataSource in
``sources/`` takes over the cassowary-native format), and the merge /
tombstone semantics are engine operators applied over it.

Scale notes: q_scan is pure scan+filter+project — Catalyst pushes both
into the parquet reader (PushedFilters + ReadSchema pruning), so at
100 TB it reads only matching row groups of 4 columns. q_flagship is
scan → map-side partial agg → 6-group final agg: the shuffle carries
one row per (partition × group), i.e. KBs regardless of input size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassowary_spark.operators.versions import latest_version, suppress_tombstones
from cassowary_spark.exprs import srnd
from cassowary_spark.registry import query
from cassowary_spark.tables import load_table, table_path


@query(
    "q_flagship",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0                                           AS sum_qty,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0                                      AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0                   AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0     AS sum_charge,
           floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0                                           AS avg_qty,
           floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0                                      AS avg_price,
           floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0                                           AS avg_disc,
           count(*)                                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan→filter→agg→sort end-to-end.

    The filter pushes to the parquet scan; the aggregation is a
    partial+final hash agg on 6 groups (shuffle payload ~bytes).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            srnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            srnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            srnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            srnd(F.sum(charge), 2).alias("sum_charge"),
            srnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            srnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            srnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity BETWEEN 30 AND 40
    """,
)
def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw scan with filter+projection pushdown (A1).

    Maps to the reference's SSTable InputFormat scan; .explain() shows
    PushedFilters [EqualTo(l_returnflag,R), GTE/LTE(l_quantity)] and a
    4-column ReadSchema — at 100 TB only matching row groups are read.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R") & F.col("l_quantity").between(30, 40)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "q_latest_version",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-version reconcile (A2): last-write-wins per key.

    Models the SSTable merge: many versions of a key across files
    resolve to the newest cell. One hash-shuffle on the key.
    """
    ev = load_table(spark, sf_dir, "events")
    return latest_version(ev, ["user_id"], "ts", tiebreakers=["event_id"]).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@query(
    "q_tombstone_filter",
    oracle="""
    WITH tomb AS (
        SELECT user_id, max(ts) AS tomb_ts
        FROM events WHERE event_type = 'error' GROUP BY user_id
    )
    SELECT e.user_id, count(*) AS n_surviving, floor((sum(e.value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM events e LEFT JOIN tomb t ON e.user_id = t.user_id
    WHERE e.event_type <> 'error' AND (t.tomb_ts IS NULL OR e.ts > t.tomb_ts)
    GROUP BY e.user_id
    """,
)
def q_tombstone_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone suppression (A3): 'error' events act as row tombstones.

    A tombstone with timestamp T deletes every non-error event of that
    user at ts <= T (Cassandra delete semantics). The tombstone set is
    pre-aggregated to max-ts-per-key and broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    live = ev.filter(F.col("event_type") != "error")
    tombs = ev.filter(F.col("event_type") == "error")
    survived = suppress_tombstones(live, tombs, ["user_id"], "ts")
    return survived.groupBy("user_id").agg(
        F.count("*").alias("n_surviving"),
        srnd(F.sum("value"), 4).alias("sum_value"),
    )


def build_sstable_snapshot(sf_dir: str) -> str:
    """Materialize `supplier` as a cassowary-style SSTable snapshot.

    The snapshot is built once per sf_dir (idempotent, cached under
    the repo) and deliberately exercises the hard parts of the scan
    path: 3 overlapping generations (multi-version rows needing
    last-write-wins reconcile), 5 phantom rows present only in the
    data generations, and a 4th generation of row tombstones deleting
    exactly those phantoms — so a correct merged read equals the
    parquet table bit-for-bit and the DuckDB oracle can gate it.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassowary_spark.sources.convert import (
        infer_schema,
        write_snapshot,
        write_tombstone_generation,
    )

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    snap = os.path.join(
        repo_root, ".sstable_cache", os.path.basename(sf_dir.rstrip("/")), "supplier"
    )
    if os.path.exists(os.path.join(snap, "ks-supplier-jb-4-TOC.txt")):
        return snap

    t = pq.read_table(table_path(sf_dir, "supplier"))
    phantom_keys = [10_000_001 + i for i in range(5)]
    phantom = pa.table(
        {
            "s_suppkey": pa.array(phantom_keys, pa.int64()),
            "s_name": pa.array([f"Phantom#{k}" for k in phantom_keys]),
            "s_nationkey": pa.array([0] * 5, pa.int32()),
            "s_acctbal": pa.array([0.0] * 5, pa.float64()),
        }
    )
    write_snapshot(
        pa.concat_tables([t, phantom]), snap, "s_suppkey",
        keyspace="ks", name="supplier", generations=3,
    )
    write_tombstone_generation(
        snap, infer_schema(t, "s_suppkey"), phantom_keys,
        generation=4, keyspace="ks", name="supplier",
    )
    return snap


@query(
    "q_sstable_scan",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    WHERE s_nationkey < 20
    """,
)
def q_sstable_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSTable DataSource scan (A1-A4): `format("sstable")` end-to-end.

    Reads the supplier snapshot written in the cassowary on-disk format
    (3 overlapping deflate-compressed generations + a tombstone
    generation), merging last-write-wins and suppressing tombstones at
    scan time; hash-gated against DuckDB over the original parquet.
    The s_nationkey filter stays Spark-side (non-key column); key-range
    and point predicates push into the source (see tests/test_sstable).
    """
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_sstable_snapshot(sf_dir)
    return read_sstable(spark, snap).filter(F.col("s_nationkey") < 20)


@query(
    "q_sstable_lookup",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (1, 7, 42)
    """,
)
def q_sstable_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSTable point lookup (A1 + §4 pushdown): key IN-list probe.

    The IN predicate pushes into the DataSource (pushFilters), which
    bloom-prunes generations per key and reads only the matching
    Index.db slots — the Cassandra read path, not a table scan. At
    100 TB this is O(keys × generations) chunk reads, independent of
    snapshot size.
    """
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_sstable_snapshot(sf_dir)
    return read_sstable(spark, snap).filter(F.col("s_suppkey").isin(1, 7, 42))


def build_wide_snapshot(sf_dir: str) -> str:
    """Materialize events as a Cassandra wide-row snapshot (cached).

    user_id is the partition key; each event is one dynamic column
    (name = zero-padded event_id, value = DoubleType-encoded value,
    cell timestamp = event time in µs). Two generations deal events
    round-robin, so a merged read must union each user's cells across
    files — the wide-row shape SURVEY.md §1.1 describes.
    """
    import pyarrow.parquet as pq

    from cassowary_spark.sources.convert import write_wide_snapshot

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    snap = os.path.join(
        repo_root, ".sstable_cache", os.path.basename(sf_dir.rstrip("/")), "events_wide"
    )
    if os.path.exists(os.path.join(snap, "ks-events-jb-2-TOC.txt")):
        return snap
    t = pq.read_table(table_path(sf_dir, "events"), columns=["user_id", "event_id", "ts", "value"])
    import pyarrow.compute as pc
    import pyarrow as pa

    padded = pc.utf8_lpad(pc.cast(t.column("event_id"), pa.string()), 12, "0")
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id", padded)
    write_wide_snapshot(
        t, snap, key_col="user_id", name_col="event_id", value_col="value",
        ts_col="ts", value_validator="DoubleType", keyspace="ks", name="events",
        generations=2,
    )
    return snap


def build_clustered_snapshot(sf_dir: str) -> str:
    """Materialize a lineitem slice as a CQL3 clustered snapshot
    (cached): partition key l_orderkey, clustering key l_linenumber,
    two value fields — the composite-cell-name layout CQL3 tables use
    over wide rows. Two round-robin generations force cross-file
    merge of individual CQL3 rows."""
    import pyarrow.parquet as pq

    from cassowary_spark.sources.convert import write_clustered_snapshot

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    snap = os.path.join(
        repo_root, ".sstable_cache", os.path.basename(sf_dir.rstrip("/")), "lineitem_cql3"
    )
    if os.path.exists(os.path.join(snap, "ks-lineitem-jb-2-TOC.txt")):
        return snap
    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    write_clustered_snapshot(
        t, snap, key_col="l_orderkey", clustering_cols=["l_linenumber"],
        keyspace="ks", name="lineitem", generations=2, ts_per_generation=False,
    )
    return snap


@query(
    "q_sstable_clustered",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(max(l_quantity) * 10000.0 + 0.5) / 10000.0 AS l_quantity,
           floor(max(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS l_extendedprice
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    """,
)
def q_sstable_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL3 clustered table scan (A1/§1.1 composite columns).

    lineitem as a CQL3 table: l_orderkey partitions, l_linenumber
    clustering, fields as composite-named cells merged across two
    generations; one output row per CQL3 row. The fixture's duplicate
    (orderkey, linenumber) pairs upsert Cassandra-style — equal-
    timestamp writes resolve per cell to the greater value bytes,
    i.e. numeric max for positive BE doubles — which the GROUP BY max
    oracle reproduces exactly. Partition-key pushdown applies
    unchanged; clustering-range pushdown would be the next refinement
    (Cassandra's column-slice reads)."""
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_clustered_snapshot(sf_dir)
    df = read_sstable(spark, snap)
    return df.select(
        "l_orderkey", "l_linenumber",
        srnd(F.col("l_quantity"), 4).alias("l_quantity"),
        srnd(F.col("l_extendedprice"), 4).alias("l_extendedprice"),
    )


@query(
    "q_sstable_slice",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(max(l_quantity) * 10000.0 + 0.5) / 10000.0 AS l_quantity,
           floor(max(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS l_extendedprice
    FROM lineitem
    WHERE l_orderkey <= 600 AND l_linenumber <= 2
    GROUP BY l_orderkey, l_linenumber
    """,
)
def q_sstable_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-slice read (Cassandra's clustering-range query).

    The clustering predicate pushes into the source at two levels:
    large partitions are read through the promoted per-partition
    column index (ColumnIndex.db — only cell blocks overlapping the
    slice hit the decompressor, Cassandra's promoted-index read), and
    surviving CQL3 rows are still dropped cell-side before any field
    decode. Fixture partitions are small, so here the win is the
    decode-side drop; the I/O-level path is property- and e2e-tested. The partition-key
    range on a signed LongType key stays Spark-side (BE byte order
    isn't value order across the sign; UTF8/ascii/bytes keys get index
    pruning — see tests/test_sstable.py range-pruning test).
    """
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_clustered_snapshot(sf_dir)
    df = read_sstable(spark, snap)
    return df.filter((F.col("l_orderkey") <= 600) & (F.col("l_linenumber") <= 2)).select(
        "l_orderkey", "l_linenumber",
        srnd(F.col("l_quantity"), 4).alias("l_quantity"),
        srnd(F.col("l_extendedprice"), 4).alias("l_extendedprice"),
    )


def build_rt_snapshot(sf_dir: str) -> str:
    """Clustered lineitem snapshot plus a generation of range tombstones
    (cached): for every partition with l_orderkey <= 200, a slice
    delete of clustering range l_linenumber in [3, 5] — Cassandra's
    ``DELETE ... WHERE pk = ? AND ck >= 3 AND ck <= 5``, the third
    delete kind after cell and row tombstones."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cassowary_spark.sources.convert import (
        composite_slice_bounds,
        write_clustered_snapshot,
        write_range_tombstone_generation,
    )

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    snap = os.path.join(
        repo_root, ".sstable_cache", os.path.basename(sf_dir.rstrip("/")), "lineitem_rt"
    )
    if os.path.exists(os.path.join(snap, "ks-lineitem-jb-3-TOC.txt")):
        return snap
    t = pq.read_table(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    write_clustered_snapshot(
        t, snap, key_col="l_orderkey", clustering_cols=["l_linenumber"],
        keyspace="ks", name="lineitem", generations=2, ts_per_generation=False,
    )
    schema = {
        "key": ["l_orderkey", "LongType"],
        "columns": [["l_quantity", "DoubleType"], ["l_extendedprice", "DoubleType"]],
        "clustering": [["l_linenumber", "Int32Type"]],
    }
    lo, hi = composite_slice_bounds(schema, [3], [5])
    keys = pc.unique(
        t.filter(pc.less_equal(t.column("l_orderkey"), 200)).column("l_orderkey")
    ).to_pylist()
    write_range_tombstone_generation(
        snap, schema, [(k, lo, hi) for k in sorted(keys)],
        generation=3, keyspace="ks", name="lineitem", timestamp=5_000,
    )
    return snap


@query(
    "q_sstable_rt",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(max(l_quantity) * 10000.0 + 0.5) / 10000.0 AS l_quantity,
           floor(max(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS l_extendedprice
    FROM lineitem
    WHERE NOT (l_orderkey <= 200 AND l_linenumber BETWEEN 3 AND 5)
    GROUP BY l_orderkey, l_linenumber
    """,
)
def q_sstable_rt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-tombstone (clustering-slice delete) read — A3's third
    delete kind.

    A tombstone-only generation carries per-partition slice deletes
    (l_linenumber in [3,5] for l_orderkey <= 200); the merged read
    suppresses covered cells across older generations at reconcile
    time, reproduced by the oracle's NOT(...) predicate. DeletionInfo
    stays per-partition, so at 100 TB slice deletes cost one small
    generation, never a rewrite of the data files.
    """
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_rt_snapshot(sf_dir)
    return read_sstable(spark, snap).select(
        "l_orderkey", "l_linenumber",
        srnd(F.col("l_quantity"), 4).alias("l_quantity"),
        srnd(F.col("l_extendedprice"), 4).alias("l_extendedprice"),
    )


@query(
    "q_sstable_wide",
    oracle="""
    SELECT user_id,
           event_id,
           floor(value * 10000.0 + 0.5) / 10000.0 AS value,
           epoch_us(ts) AS cell_ts
    FROM events
    """,
)
def q_sstable_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-row scan (A1/§1.1): dynamic columns in long format.

    Each user's events live as dynamic cells of one partition across
    two generations; the source merges them and emits
    (user_id, column_name, value, cell_ts) — Cassandra's sorted-map
    row shape, with cell timestamps surfacing the event time. At
    100 TB a single user's multi-million-cell partition streams
    through one task (cells are iterated, never materialized per
    partition)."""
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_wide_snapshot(sf_dir)
    return read_sstable(spark, snap).select(
        "user_id",
        F.col("column_name").cast("long").alias("event_id"),
        srnd(F.col("value"), 4).alias("value"),
        "cell_ts",
    )


def build_collections_snapshot(sf_dir: str) -> str:
    """Materialize per-order lineitem collections as a CQL3 snapshot
    (cached): partition key l_orderkey, clustering key n_items, plus
    three collection columns — ``prices list<double>`` (one element
    per lineitem, position-keyed), ``supp_set set<long>`` (distinct
    suppkeys, element-in-cell-name), ``qty_map map<int,double>``
    (linenumber → max quantity; keys pre-deduped because map cell
    names must be unique). Element cells are dealt round-robin across
    two generations, so every single collection must merge its cells
    across sstable files."""
    import duckdb

    from cassowary_spark.sources.convert import write_collections_snapshot

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    snap = os.path.join(
        repo_root, ".sstable_cache", os.path.basename(sf_dir.rstrip("/")), "lineitem_coll"
    )
    if os.path.exists(os.path.join(snap, "ks-lineitem-jb-2-TOC.txt")):
        return snap
    con = duckdb.connect()
    t = con.execute(
        f"""
        WITH src AS (SELECT * FROM read_parquet('{table_path(sf_dir, "lineitem")}')),
        per_ln AS (
            SELECT l_orderkey, l_linenumber, max(l_quantity) AS q
            FROM src GROUP BY 1, 2
        ),
        maps AS (
            SELECT l_orderkey,
                   list(l_linenumber ORDER BY l_linenumber) AS qk,
                   list(q ORDER BY l_linenumber) AS qv
            FROM per_ln GROUP BY 1
        ),
        base AS (
            SELECT l_orderkey,
                   CAST(count(*) AS INT) AS n_items,
                   list(l_extendedprice ORDER BY l_linenumber, l_extendedprice) AS prices,
                   list(DISTINCT l_suppkey) AS supp_set
            FROM src GROUP BY 1
        )
        SELECT b.l_orderkey, b.n_items, b.prices, b.supp_set, m.qk, m.qv
        FROM base b JOIN maps m USING (l_orderkey)
        ORDER BY l_orderkey
        """
    ).arrow()
    con.close()
    write_collections_snapshot(
        pa_table_combine(t), snap,
        key_col="l_orderkey", clustering_cols=["n_items"],
        list_cols={"prices": "DoubleType"},
        set_cols={"supp_set": "LongType"},
        map_cols={"qty_map": ("qk", "qv", "Int32Type", "DoubleType")},
        keyspace="ks", name="lineitem", generations=2,
    )
    return snap


def pa_table_combine(t):
    """ChunkedArray → single chunk so to_pydict row indexing is O(1)."""
    return t.combine_chunks()


@query(
    "q_sstable_collections",
    oracle="""
    SELECT l_orderkey,
           CAST(count(*) AS INT) AS n_items,
           count(*) AS n_prices,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_prices,
           count(DISTINCT l_suppkey) AS n_supps,
           min(l_suppkey) AS min_supp,
           max(l_suppkey) AS max_supp,
           count(DISTINCT l_linenumber) AS n_qty,
           floor((max(CASE WHEN l_linenumber = 1 THEN l_quantity END)) * 10000.0 + 0.5) / 10000.0 AS qty_l1
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_sstable_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL3 collection columns (A4/§1.1): list<double>, set<long>, and
    map<int,double> decoded from collection-keyed composite cells, each
    collection merged from cells interleaved across two generations.

    Collection values are reduced to scalars (sizes, sums, element
    lookups) so the oracle hash is representation-independent — the
    same convention as q_fn_array. ``sum_prices`` folds the decoded
    list in element order; ``qty_l1`` is a map lookup on key 1.
    """
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_collections_snapshot(sf_dir)
    df = read_sstable(spark, snap)
    return df.select(
        "l_orderkey",
        "n_items",
        F.size("prices").alias("n_prices"),
        srnd(F.aggregate("prices", F.lit(0.0), lambda acc, x: acc + x), 2).alias("sum_prices"),
        F.size("supp_set").alias("n_supps"),
        F.array_min("supp_set").alias("min_supp"),
        F.array_max("supp_set").alias("max_supp"),
        F.size("qty_map").alias("n_qty"),
        srnd(F.element_at("qty_map", F.lit(1)), 4).alias("qty_l1"),
    )


@query(
    "q_sstable_sink",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           floor(s_acctbal * 10000.0 + 0.5) / 10000.0 AS s_acctbal
    FROM supplier
    """,
)
def q_sstable_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSTable sink round-trip (A6): write supplier through
    ``df.write.format("sstable")`` (each task stages one generation,
    driver commit renames them in), then read the snapshot back merged.

    The write runs on every call (mode=overwrite, no caching) so the
    staged-commit path is actually exercised by the driver, not just
    by pytest. Hash-partitioned tasks give key-disjoint generations;
    the merged read reconciles them back to exactly the input rows —
    which is what the oracle (the source table itself) asserts.
    """
    from cassowary_spark.sources.sstable_datasource import read_sstable, write_sstable

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    snap = os.path.join(
        repo_root, ".sstable_cache", os.path.basename(sf_dir.rstrip("/")), "supplier_sink"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    write_sstable(s.repartition(4, "s_suppkey"), snap, key="s_suppkey", mode="overwrite")
    return read_sstable(spark, snap).select(
        "s_suppkey", "s_name", "s_nationkey",
        srnd(F.col("s_acctbal"), 4).alias("s_acctbal"),
    )


@query(
    "q_file_formats",
    oracle="""
    SELECT fmt, lang, count(*) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS chars
    FROM (
        SELECT 'csv' AS fmt, lang, text FROM documents
        UNION ALL
        SELECT 'json' AS fmt, lang, text FROM documents
    ) GROUP BY fmt, lang
    """,
)
def q_file_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-format connectors (A7): round-trip the documents table
    through BOTH the json-lines and csv sinks/sources and aggregate
    the union — proving write→read fidelity for the two Hive-era
    interchange formats on real text (quoting, commas) against the
    parquet-backed oracle. Format caches are written once per sf dir.
    """
    import os as _os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # v2: cache written with RFC4180 quote/escape — older caches used
    # backslash-escape and would mis-parse under the new reader options
    cache = os.path.join(repo_root, ".file_cache", "v2", os.path.basename(sf_dir.rstrip("/")))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    paths = {}
    for fmt in ("json", "csv"):
        p = os.path.join(cache, f"documents_{fmt}")
        if not _os.path.exists(_os.path.join(p, "_SUCCESS")):
            w = d.coalesce(4).write.mode("overwrite")
            if fmt == "csv":
                # RFC4180 quoting (escape = doubled quote) so the
                # multiLine reader below reassembles embedded newlines
                w.option("header", "true").option("quote", '"').option(
                    "escape", '"'
                ).csv(p)
            else:
                w.json(p)
        paths[fmt] = p
    ddl = "doc_id bigint, lang string, text string"
    jdf = spark.read.schema(ddl).json(paths["json"])
    # multiLine + explicit quote/escape: text containing embedded
    # newlines must survive the CSV round-trip as ONE record (the
    # writer quotes it; without multiLine the reader would split the
    # quoted field into corrupt rows while the oracle reads parquet)
    cdf = (
        spark.read.schema(ddl)
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(paths["csv"])
    )
    u = cdf.withColumn("fmt", F.lit("csv")).unionByName(jdf.withColumn("fmt", F.lit("json")))
    return u.groupBy("fmt", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("chars"),
    )


@query(
    "q_sstable_compact",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    """,
)
def q_sstable_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Major compaction (A8): collapse the 4-generation supplier
    snapshot (3 overlapping data generations + a row-tombstone
    generation) into ONE sstable in a fresh directory, then scan it.

    The oracle is the UNCOMPACTED read's SQL — compaction must be
    read-invariant: LWW resolves multi-version rows, the phantom rows
    deleted by generation 4's tombstones are dropped AND the tombstones
    themselves are GC'd, so the single surviving generation reproduces
    the parquet table exactly. Compaction runs once per sf_dir (the
    output is cached beside the snapshot, keyed by its TOC)."""
    from cassowary_spark.sources.convert import compact_snapshot
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_sstable_snapshot(sf_dir)
    out = snap + "-compacted"
    if not os.path.exists(os.path.join(out, "ks-supplier-jb-5-TOC.txt")):
        compact_snapshot(snap, delete_inputs=False, out_dir=out)
    return read_sstable(spark, out)


@query(
    "q_sstable_stream",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
    UNION ALL
    SELECT CAST(10000001 + i AS BIGINT)                    AS s_suppkey,
           'Phantom#' || CAST(10000001 + i AS VARCHAR)     AS s_name,
           CAST(0 AS INTEGER)                              AS s_nationkey,
           CAST(0.0 AS DOUBLE)                             AS s_acctbal
    FROM range(5) t(i)
    """,
)
def q_sstable_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSTable generation-replay (S8) — batch twin of the stream
    source's offset semantics: each generation is read UNMERGED as its
    own delta batch (``min_gen``/``max_gen`` = the stream's
    ``readBetweenOffsets``), the batches union, and the query layer
    folds them last-write-wins per key — exactly the downstream
    reconcile the stream leaves to `latest_version`/stateful dedup.

    The oracle spells out the stream's delta semantics: generation 4 is
    row tombstones ONLY, and a delta stream emits nothing for a delete,
    so the folded replay still contains the 5 phantom rows (known
    synthetic values) on top of the supplier table — unlike the merged
    batch read, which suppresses them. Scale: per-generation reads are
    parallel scans; the fold is one hash shuffle on the key."""
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_sstable_snapshot(sf_dir)
    batches = [
        read_sstable(spark, snap, min_gen=str(g), max_gen=str(g)).withColumn(
            "__gen", F.lit(g)
        )
        for g in (1, 2, 3)  # gen 4 (tombstones only) emits no delta rows
    ]
    replay = batches[0]
    for b in batches[1:]:
        replay = replay.unionByName(b)
    return latest_version(replay, ["s_suppkey"], "__gen").drop("__gen")


@query(
    "q_sstable_timetravel",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM (SELECT *, row_number() OVER (ORDER BY s_suppkey) AS rn FROM supplier)
    WHERE rn <= 2 * ((SELECT count(*) + 5 FROM supplier) // 3)
    """,
)
def q_sstable_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation time-travel (A2b): read the snapshot AS OF generation
    2 — the log-structured storage's free historical view (immutable
    sstables make every past flush a queryable snapshot boundary).

    ``max_gen=2`` restricts the merge to generations 1-2: phantom keys
    (all above the real key range, introduced in gen 3's slice and
    deleted by gen 4) are absent, as is gen 3's key slice. The writer
    deals sorted keys into overlapping slices — gen 1 covers
    partitions [0, w), gen 2 reaches [.., 2w) with w = n//3 — so the
    as-of-gen-2 view is exactly the 2w lowest keys, which is what the
    oracle's window spells out. Scale: time-travel is pure generation
    pruning at split planning, strictly cheaper than a full read.
    """
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_sstable_snapshot(sf_dir)
    return read_sstable(spark, snap, max_gen="2")


@query(
    "q_sstable_gen_diff",
    oracle="""
    WITH ranked AS (
        SELECT *, row_number() OVER (ORDER BY s_suppkey) AS rn FROM supplier
    )
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal, 'insert' AS change
    FROM ranked
    WHERE rn > 2 * ((SELECT count(*) + 5 FROM supplier) // 3)
    UNION ALL
    SELECT 10000001 + i AS s_suppkey,
           'Phantom#' || CAST(10000001 + i AS VARCHAR) AS s_name,
           CAST(0 AS INTEGER) AS s_nationkey,
           0.0 AS s_acctbal,
           'insert' AS change
    FROM range(0, 5) t(i)
    """,
)
def q_sstable_gen_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation CDC (A11): diff the snapshot as-of generation 2
    against as-of generation 3 — the change feed between two flush
    boundaries, extracted from the immutable generations themselves
    (no change log needed; the log-structured storage IS the log).

    On the supplier fixture the gen-3 delta is pure inserts: the top
    third of the key range (the writer deals sorted keys into
    overlapping slices, gens 1-2 cover the 2w lowest keys) plus the
    five phantom rows that gen 4 later tombstones — the oracle spells
    both sets out. Deletes and updates are exercised with planted
    generations in tests/test_sstable.py (the gen-4 diff is exactly
    the five phantom deletions).

    Scale: both sides are generation-pruned scans; ONE co-partitioned
    full-outer shuffle join + row-local null-safe compare
    (operators/versions.py::snapshot_diff).
    """
    from cassowary_spark.operators.versions import snapshot_diff
    from cassowary_spark.sources.sstable_datasource import read_sstable

    snap = build_sstable_snapshot(sf_dir)
    old = read_sstable(spark, snap, max_gen="2")
    new = read_sstable(spark, snap, max_gen="3")
    return snapshot_diff(
        old, new, ["s_suppkey"], ["s_name", "s_nationkey", "s_acctbal"]
    )


@query(
    "q_orc_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS chars,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
    FROM documents GROUP BY lang
    """,
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC connector round-trip (A7 family): write the documents
    table to ORC (the Hive-era columnar interchange format the
    reference's Hive surface spoke natively) and read it back for an
    aggregation the parquet-backed oracle must reproduce — proving
    write→read fidelity including multi-line text payloads.

    The ORC cache is written once per sf dir (read fidelity is the
    surface under test; the distributed write path has its own
    always-on exercise in q_sstable_sink). Scale: ORC scans get the
    same Catalyst treatment as parquet — column pruning + predicate
    pushdown reach the reader, partition-parallel splits.
    """
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cache = os.path.join(repo_root, ".file_cache", "v2", os.path.basename(sf_dir.rstrip("/")))
    p = os.path.join(cache, "documents_orc")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text", "n_chars")
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        d.coalesce(4).write.mode("overwrite").orc(p)
    o = spark.read.orc(p)
    return o.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("chars"),
        F.sum("n_chars").alias("n_chars_sum"),
    )


@query(
    "q_partitioned_lake",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           count(*) AS n_orders,
           floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY yr
    """,
)
def q_partitioned_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned lake layout (A5/A7 family): the orders
    table written `partitionBy(o_orderstatus)` — the physical layout
    every lakehouse table maintenance job produces — then read back
    with a partition-key predicate. Catalyst turns the predicate into
    a PartitionFilter: non-matching directories are never listed into
    the scan (asserted in tests/test_plans.py), which at 100 TB is
    the difference between scanning one status partition and the
    whole table.

    The partitioned cache is written once per sf dir. The aggregation
    after the pruned scan is an ordinary partial+final groupBy on the
    order year.
    """
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cache = os.path.join(repo_root, ".file_cache", "v2", os.path.basename(sf_dir.rstrip("/")))
    p = os.path.join(cache, "orders_by_status")
    o = load_table(spark, sf_dir, "orders")
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        o.select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus") \
            .repartition(4).write.mode("overwrite").partitionBy("o_orderstatus").parquet(p)
    lake = spark.read.parquet(p).filter(F.col("o_orderstatus") == "F")
    return lake.groupBy(
        F.year("o_orderdate").cast("int").alias("yr")
    ).agg(
        F.count("*").alias("n_orders"),
        srnd(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "q_sstable_to_lake",
    oracle="""
    SELECT s_nationkey,
           count(*) AS n_sup,
           floor(sum(s_acctbal) * 100.0 + 0.5) / 100.0 AS bal
    FROM supplier
    WHERE s_nationkey < 5
    GROUP BY s_nationkey
    """,
)
def q_sstable_to_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot→lake materialization (A12): the maintenance job
    SCALE.md prescribes for repeated analytics at 100 TB — read the
    SSTable snapshot ONCE through the merged/tombstone-resolved scan,
    land it as a Hive-partitioned parquet lake table, and serve
    queries from the lake with partition pruning (here: a nationkey
    predicate that lists 5 of 25 directories) instead of re-paying
    the Python-source decode per query.

    The lake cache is written once per sf dir; the write is the
    distributed `partitionBy` path. Correctness comes free: the
    merged snapshot equals the supplier parquet (phantoms are
    tombstoned), so the oracle is the plain parquet aggregate.
    """
    from cassowary_spark.sources.sstable_datasource import read_sstable

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cache = os.path.join(repo_root, ".file_cache", "v2", os.path.basename(sf_dir.rstrip("/")))
    p = os.path.join(cache, "supplier_lake")
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        snap = build_sstable_snapshot(sf_dir)
        read_sstable(spark, snap).write.mode("overwrite").partitionBy(
            "s_nationkey"
        ).parquet(p)
    lake = spark.read.parquet(p).filter(F.col("s_nationkey") < 5)
    return lake.groupBy("s_nationkey").agg(
        F.count("*").alias("n_sup"),
        srnd(F.sum("s_acctbal"), 2).alias("bal"),
    )


@query(
    "q_lake_backfill",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_lake_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite backfill (A5/A7 family): the lake
    maintenance op static overwrite cannot express — replace ONE
    corrupted partition of a Hive-partitioned table while every other
    partition's files stay untouched. The cache seeds the lake with
    the 'P' partition's prices doubled (the bad backfill input), then
    rewrites only that partition under
    ``spark.sql.sources.partitionOverwriteMode=dynamic``; the oracle
    is the plain orders aggregate, which only matches if the
    untouched partitions survived AND the bad partition was fully
    replaced — a static overwrite (whole-table truncate) or an append
    (doubled rows) both fail the hash.

    Scale shape: the rewrite shuffles only the target partition's
    rows; commit is per-partition directory swap, so backfilling one
    day of a 10-year table moves 1/3650th of the data. The conf is
    set per-write and restored (session-conf hygiene for the shared
    driver session).
    """
    from cassowary_spark.tables import fixture_cache_dir

    # keyed by the orders parquet's identity (path+size+mtime), so a
    # regenerated same-named fixture can never serve a stale backfill
    p = fixture_cache_dir(sf_dir, "orders_backfill", dep="orders")
    done = os.path.join(p, "_BACKFILL_DONE")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"
    )
    if not os.path.exists(done):
        # seed: the 'P' partition lands with doubled prices (bad data)
        seeded = o.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderstatus") == "P",
                F.col("o_totalprice") * F.lit(2.0),
            ).otherwise(F.col("o_totalprice")),
        )
        seeded.repartition(4).write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).parquet(p)
        # backfill: rewrite ONLY the P partition with corrected rows
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            o.filter(F.col("o_orderstatus") == "P").repartition(
                2
            ).write.mode("overwrite").partitionBy("o_orderstatus").parquet(p)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
        with open(done, "w") as fh:
            fh.write("ok\n")
    lake = spark.read.parquet(p)
    return lake.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        srnd(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def _ensure_fragmented_lake(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build (once per source-file identity) the 64-file fragmented
    orders lake and its 4-file compacted rewrite — shared by the
    compaction and file-provenance queries so their caches can't
    drift. Guards on BOTH _SUCCESS markers: a pruned fragment dir
    with a surviving compacted dir (or vice versa) regenerates both.
    """
    from cassowary_spark.tables import fixture_cache_dir

    frag = fixture_cache_dir(sf_dir, "orders_fragmented", dep="orders")
    compacted = fixture_cache_dir(sf_dir, "orders_compacted", dep="orders")
    if not (
        os.path.exists(os.path.join(compacted, "_SUCCESS"))
        and os.path.exists(os.path.join(frag, "_SUCCESS"))
    ):
        o = load_table(spark, sf_dir, "orders").select("o_orderkey")
        o.repartition(64).write.mode("overwrite").parquet(frag)
        spark.read.parquet(frag).repartition(4).write.mode(
            "overwrite"
        ).parquet(compacted)
    return frag, compacted


@query(
    "q_compact_small_files",
    oracle="""
    SELECT CAST(64 AS BIGINT) AS n_files_before,
           CAST(4 AS BIGINT) AS n_files_after,
           count(*) AS n_rows,
           CAST(sum(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_checksum
    FROM orders
    """,
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (A-family maintenance, the lakehouse
    OPTIMIZE): a lake table fragmented into 64 tiny files — the
    streaming-ingest pathology where every micro-batch lands a file
    and scan planning drowns in per-file overhead — rewritten into 4
    right-sized files. Content equality is the oracle (row count +
    key checksum over the compacted table); the before/after file
    counts are pinned literals, so a compaction that loses or
    duplicates rows OR fails to actually reduce the file count fails
    the hash.

    Scale shape: the rewrite is one repartition (hash, no sort) —
    at 100 TB you compact per partition-directory, newest-first,
    and the pinned counts generalize to a files-per-partition target.
    The attempt-safe staged-write commit comes free from Spark's
    FileOutputCommitter.
    """
    frag, compacted = _ensure_fragmented_lake(spark, sf_dir)

    def _n_parquet(d: str) -> int:
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    n_before = _n_parquet(frag)
    n_after = _n_parquet(compacted)
    lake = spark.read.parquet(compacted)
    return lake.agg(
        F.lit(n_before).cast("long").alias("n_files_before"),
        F.lit(n_after).cast("long").alias("n_files_after"),
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_orderkey").cast("long")).alias("key_checksum"),
    )


@query(
    "q_regex_serde",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS value_e4_sum
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT '__malformed__' AS event_type,
           CAST(3 AS BIGINT) AS n_events,
           CAST(0 AS BIGINT) AS value_e4_sum
    """,
)
def q_regex_serde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RegexSerDe-style text-log ingestion (A-family connector): the
    Hive pattern the reference's era lived on — a raw text log whose
    lines parse into columns via ONE regex, with non-matching lines
    quarantined instead of killing the job. The cache round-trips
    events through a printf-formatted log (value pre-quantized to
    integer 1e-4 units at WRITE time, so parse-back is exact integer
    arithmetic — no float-printf rounding to reconcile) and plants 3
    garbage lines; the read side is `spark.read.text` +
    `regexp_extract`, the malformed bucket is the rows the regex
    rejects. The oracle recomputes the same aggregate from the
    original events table + the planted-bad-line count, so a parser
    that drops a real line, mis-parses a field, or eats the garbage
    silently fails the hash.

    Scale shape: text scan splits by line ranges; the regex and field
    casts are row-local JVM expressions (one regex evaluation per
    field via regexp_extract groups); quarantine is a filter, not an
    error path. One partial agg on a 5-value key.
    """
    from cassowary_spark.tables import fixture_cache_dir

    log_dir = fixture_cache_dir(sf_dir, "events_log", dep="events")
    ev = load_table(spark, sf_dir, "events")
    if not os.path.exists(os.path.join(log_dir, "_SUCCESS")):
        lines = ev.select(
            F.format_string(
                "evt id=%d user=%d type=%s v4=%d",
                F.col("event_id"),
                F.col("user_id"),
                F.col("event_type"),
                F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5)).cast(
                    "long"
                ),
            ).alias("value")
        )
        bad = spark.createDataFrame(
            [("CORRUPT GARBAGE LINE",), ("evt id=notanint user=? ...",),
             ("",)],
            ["value"],
        )
        lines.unionByName(bad).coalesce(4).write.mode("overwrite").text(
            log_dir
        )
    raw = spark.read.text(log_dir)
    pat = r"^evt id=(\d+) user=(\d+) type=(\w+) v4=(-?\d+)$"
    parsed = raw.select(
        F.regexp_extract("value", pat, 3).alias("event_type"),
        F.regexp_extract("value", pat, 4).alias("__v4"),
        F.col("value").rlike(pat).alias("__ok"),
    )
    good = parsed.filter(F.col("__ok")).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("__v4").cast("long")).alias("value_e4_sum"),
    )
    bad_row = (
        parsed.filter(~F.col("__ok"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.lit("__malformed__").alias("event_type"),
            "n_events",
            F.lit(0).cast("long").alias("value_e4_sum"),
        )
    )
    return good.unionByName(bad_row)


@query(
    "q_file_provenance",
    oracle="""
    SELECT CAST(64 AS BIGINT) AS n_files,
           count(*) AS n_rows,
           CAST(64 AS BIGINT) AS n_files_nonempty,
           CAST(sum(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_checksum
    FROM orders
    """,
)
def q_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level file provenance via the `_metadata` hidden columns
    (A-family lake forensics): every row of the 64-file fragmented
    lake reports which physical file served it — the debugging
    primitive behind "which ingest batch produced this bad row?"
    without any provenance column materialized in the data.
    `_metadata.file_name` exists only when selected; the stored
    schema is untouched. The oracle pins the file count and the full
    content checksum, so provenance that drops files or double-reads
    one fails the hash.

    Scale shape: `_metadata` is populated by the scan operator
    per-split at zero I/O cost (the reader already knows its file);
    the distinct-file rollup is a ≤64-key partial agg.
    """
    frag, _ = _ensure_fragmented_lake(spark, sf_dir)
    lake = spark.read.parquet(frag).select(
        "o_orderkey", F.col("_metadata.file_name").alias("src_file")
    )
    per_file = lake.groupBy("src_file").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_orderkey").cast("long")).alias("ck"),
    )
    return per_file.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("n").alias("n_rows"),
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_files_nonempty"),
        F.sum("ck").alias("key_checksum"),
    )
