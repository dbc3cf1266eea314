"""Property-based SSTable tests (hypothesis): randomized snapshots.

Generates arbitrary multi-generation write histories (cells, updates,
cell tombstones, row tombstones, TTL expiry) and checks the full
pipeline — binary encode → component files → split planning with a
random split count → chunked reads → k-way merge → reconcile —
against an independent in-memory model of Cassandra's semantics.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from cassowary_spark.sources.sstable_datasource import SSTableDataSourceReader
from cassowary_spark.sources.sstable_format import (
    FLAG_COUNTER,
    FLAG_EXPIRING,
    FLAG_TOMBSTONE,
    Cell,
    Partition,
    SSTableWriter,
    encode_composite,
    range_tombstone,
)
from cassowary_spark.sources.validators import get_validator

KEYS = st.integers(min_value=0, max_value=60)
COLS = st.sampled_from(["a", "b", "c"])
TS = st.integers(min_value=1, max_value=50)
READ_TS = 500  # TTL'd cells expire when local_expiration <= 500

cell_write = st.fixed_dictionaries(
    {
        "col": COLS,
        "value": st.text(alphabet="xyz", min_size=0, max_size=5),
        "ts": TS,
        "kind": st.sampled_from(["live", "live", "live", "tomb", "expired", "unexpired"]),
    }
)

# (lo, hi, ts) column-name slice delete; lo/hi normalized in the writer
range_tomb = st.tuples(COLS, COLS, TS)

generation = st.lists(
    st.fixed_dictionaries(
        {
            "key": KEYS,
            "row_tomb": st.one_of(st.none(), TS),
            "cells": st.lists(cell_write, max_size=4),
            "range_tombs": st.lists(range_tomb, max_size=2),
        }
    ),
    max_size=12,
)


def _mk_cell(w) -> Cell:
    name = w["col"].encode()
    if w["kind"] == "tomb":
        return Cell(name, b"", w["ts"], FLAG_TOMBSTONE)
    if w["kind"] == "expired":
        return Cell(name, w["value"].encode(), w["ts"], FLAG_EXPIRING, 1, READ_TS)
    if w["kind"] == "unexpired":
        return Cell(name, w["value"].encode(), w["ts"], FLAG_EXPIRING, 1, READ_TS + 100)
    return Cell(name, w["value"].encode(), w["ts"])


def _dedupe_generation(rows):
    """Merge duplicate keys within one generation (a real memtable
    holds one partition per key)."""
    by_key: dict[int, dict] = {}
    for r in rows:
        slot = by_key.setdefault(
            r["key"], {"row_tomb": None, "cells": [], "range_tombs": []}
        )
        if r["row_tomb"] is not None:
            slot["row_tomb"] = max(slot["row_tomb"] or 0, r["row_tomb"])
        slot["cells"].extend(r["cells"])
        for lo, hi, ts in r.get("range_tombs", ()):
            slot["range_tombs"].append((min(lo, hi), max(lo, hi), ts))
    return by_key


def _model(gens) -> dict[int, dict[str, str | None]]:
    """Independent reference model of Cassandra merge semantics."""
    acc: dict[int, dict] = {}
    for g, rows in enumerate(gens, start=1):
        for key, slot in _dedupe_generation(rows).items():
            m = acc.setdefault(key, {"tomb": None, "cells": {}, "rts": []})
            if slot["row_tomb"] is not None:
                m["tomb"] = max(m["tomb"] or 0, slot["row_tomb"])
            m["rts"].extend(slot["range_tombs"])
            for wcell in slot["cells"]:
                c = _mk_cell(wcell)
                rank = (c.timestamp, c.is_tombstone, c.value, g)
                cur = m["cells"].get(wcell["col"])
                if cur is None or rank > cur[0]:
                    m["cells"][wcell["col"]] = (rank, c)
    expected: dict[int, dict[str, str | None]] = {}
    for key, m in acc.items():
        out = {}
        for col, (_rank, c) in m["cells"].items():
            if c.is_tombstone:
                continue
            if m["tomb"] is not None and c.timestamp <= m["tomb"]:
                continue
            if any(lo <= col <= hi and c.timestamp <= ts for lo, hi, ts in m["rts"]):
                continue
            if c.flags & FLAG_EXPIRING and c.local_expiration <= READ_TS:
                continue
            out[col] = c.value.decode() if c.value else None
        # any live cell — even an empty-valued one, which decodes to
        # NULL but keeps the row alive (Cassandra's empty-vs-null) —
        # makes the row exist
        if out:
            expected[key] = {k: v for k, v in out.items() if v is not None}
    return expected


@given(gens=st.lists(generation, min_size=1, max_size=4), splits=st.integers(1, 5))
@settings(max_examples=150, deadline=None)
def test_randomized_snapshot_matches_model(tmp_path_factory, gens, splits):
    tmp = str(tmp_path_factory.mktemp("prop"))
    enc = get_validator("LongType").encode
    schema = {
        "key": ["k", "LongType"],
        "columns": [["a", "UTF8Type"], ["b", "UTF8Type"], ["c", "UTF8Type"]],
    }
    wrote_any = False
    for g, rows in enumerate(gens, start=1):
        by_key = _dedupe_generation(rows)
        w = SSTableWriter(tmp, "ks", "prop", g, schema, chunk_len=256)
        for key in sorted(by_key):
            slot = by_key[key]
            w.append(
                Partition(
                    enc(key),
                    marked_for_delete_at=slot["row_tomb"] if slot["row_tomb"] else -(2**63),
                    cells=[_mk_cell(c) for c in slot["cells"]]
                    + [
                        range_tombstone(lo.encode(), hi.encode(), ts)
                        for lo, hi, ts in slot["range_tombs"]
                    ],
                )
            )
        w.close()
        wrote_any = True
    assert wrote_any

    reader = SSTableDataSourceReader(
        {"path": tmp, "read_ts": str(READ_TS), "splits": str(splits)}, None
    )
    got: dict[int, dict[str, str]] = {}
    for p in reader.partitions():
        for item in reader.read(p):
            rows_out = (
                [tuple(d.values()) for d in item.to_pylist()]
                if isinstance(item, pa.RecordBatch)
                else [tuple(item)]
            )
            for k, a, b, c in rows_out:
                assert k not in got, "duplicate key emitted"
                got[k] = {n: v for n, v in zip("abc", (a, b, c)) if v is not None}
    assert got == _model(gens)


# ------------------------------------------------------ wide-row property

WIDE_NAMES = st.sampled_from(["m", "n", "o", "p", "q"])

wide_write = st.fixed_dictionaries(
    {
        "key": KEYS,
        "name": WIDE_NAMES,
        "value": st.text(alphabet="uv", min_size=0, max_size=4),
        "ts": TS,
        "tomb": st.booleans(),
    }
)


@given(
    gens=st.lists(st.lists(wide_write, max_size=10), min_size=1, max_size=4),
    row_tombs=st.lists(st.tuples(KEYS, TS), max_size=3),
    splits=st.integers(1, 4),
)
@settings(max_examples=80, deadline=None)
def test_wide_row_randomized_matches_model(tmp_path_factory, gens, row_tombs, splits):
    """Wide mode: dynamic columns merge per (key, name) across files."""
    tmp = str(tmp_path_factory.mktemp("wideprop"))
    enc = get_validator("LongType").encode
    schema = {
        "key": ["k", "LongType"],
        "columns": [],
        "wide": True,
        "wide_validator": "UTF8Type",
    }
    n_gens = len(gens)
    for g, writes in enumerate(gens, start=1):
        by_key: dict[int, list[Cell]] = {}
        for w_ in writes:
            by_key.setdefault(w_["key"], []).append(
                Cell(
                    w_["name"].encode(),
                    b"" if w_["tomb"] else w_["value"].encode(),
                    w_["ts"],
                    FLAG_TOMBSTONE if w_["tomb"] else 0,
                )
            )
        # last generation also carries the row tombstones
        tombs = dict.fromkeys((k for k, _ in row_tombs), None) if g == n_gens else {}
        for k, ts in row_tombs:
            if g == n_gens:
                tombs[k] = max(ts, tombs[k] or 0)
        w = SSTableWriter(tmp, "ks", "wideprop", g, schema, chunk_len=256)
        for key in sorted(set(by_key) | set(tombs)):
            w.append(
                Partition(
                    enc(key),
                    marked_for_delete_at=tombs.get(key) or -(2**63),
                    cells=by_key.get(key, []),
                )
            )
        w.close()

    # independent model: LWW per (key, name); row tombs suppress <= ts
    tomb_by_key: dict[int, int] = {}
    for k, ts in row_tombs:
        tomb_by_key[k] = max(ts, tomb_by_key.get(k, 0))
    best: dict[tuple[int, str], tuple] = {}
    for g, writes in enumerate(gens, start=1):
        for w_ in writes:
            val = b"" if w_["tomb"] else w_["value"].encode()
            rank = (w_["ts"], w_["tomb"], val, g)
            cur = best.get((w_["key"], w_["name"]))
            if cur is None or rank > cur:
                best[(w_["key"], w_["name"])] = rank
    expected = set()
    for (k, name), (ts, tomb, val, _g) in best.items():
        if tomb or ts <= tomb_by_key.get(k, -1):
            continue
        expected.add((k, name, val.decode() if val else None, ts))

    reader = SSTableDataSourceReader({"path": tmp, "splits": str(splits)}, None)
    got = set()
    for p in reader.partitions():
        for item in reader.read(p):
            rows_out = (
                [tuple(d.values()) for d in item.to_pylist()]
                if isinstance(item, pa.RecordBatch)
                else [tuple(item)]
            )
            for row in rows_out:
                assert row not in got, "duplicate wide cell emitted"
                got.add(row)
    assert got == expected


# ------------------------------------------------------- counter property

counter_write = st.fixed_dictionaries(
    {
        "key": st.integers(min_value=0, max_value=20),
        "col": COLS,
        "delta": st.integers(min_value=-100, max_value=100),
        "ts": TS,
        "reset": st.booleans(),  # True → cell tombstone (counter reset)
    }
)


@given(
    gens=st.lists(st.lists(counter_write, max_size=8), min_size=1, max_size=4),
    splits=st.integers(1, 3),
)
@settings(max_examples=80, deadline=None)
def test_counter_randomized_matches_model(tmp_path_factory, gens, splits):
    """Counters: live deltas newer than any reset sum commutatively."""
    import struct as _struct

    tmp = str(tmp_path_factory.mktemp("ctrprop"))
    enc = get_validator("LongType").encode
    schema = {
        "key": ["k", "LongType"],
        "columns": [["a", "LongType"], ["b", "LongType"], ["c", "LongType"]],
    }
    for g, writes in enumerate(gens, start=1):
        by_key: dict[int, list[Cell]] = {}
        for w_ in writes:
            if w_["reset"]:
                cell = Cell(w_["col"].encode(), b"", w_["ts"], FLAG_TOMBSTONE)
            else:
                cell = Cell(
                    w_["col"].encode(),
                    _struct.pack(">q", w_["delta"]),
                    w_["ts"],
                    FLAG_COUNTER,
                )
            by_key.setdefault(w_["key"], []).append(cell)
        w = SSTableWriter(tmp, "ks", "ctrprop", g, schema, chunk_len=256)
        for key in sorted(by_key):
            w.append(Partition(enc(key), cells=by_key[key]))
        w.close()

    # model: per (key, col), floor = newest reset ts; sum deltas > floor
    resets: dict[tuple[int, str], int] = {}
    deltas: dict[tuple[int, str], list[tuple[int, int]]] = {}
    for writes in gens:
        for w_ in writes:
            kc = (w_["key"], w_["col"])
            if w_["reset"]:
                resets[kc] = max(w_["ts"], resets.get(kc, 0))
            else:
                deltas.setdefault(kc, []).append((w_["ts"], w_["delta"]))
    expected: dict[int, dict[str, int]] = {}
    for kc, ds in deltas.items():
        floor = resets.get(kc, -(2**63))
        alive = [d for ts, d in ds if ts > floor]
        if alive:
            expected.setdefault(kc[0], {})[kc[1]] = sum(alive)

    reader = SSTableDataSourceReader({"path": tmp, "splits": str(splits)}, None)
    got: dict[int, dict[str, int]] = {}
    for p in reader.partitions():
        for item in reader.read(p):
            rows_out = (
                [tuple(d.values()) for d in item.to_pylist()]
                if isinstance(item, pa.RecordBatch)
                else [tuple(item)]
            )
            for k, a, b, c in rows_out:
                assert k not in got
                got[k] = {n: v for n, v in zip("abc", (a, b, c)) if v is not None}
    assert got == {k: v for k, v in expected.items() if v}


# ------------------------------------------------------ clustered property

clustered_write = st.fixed_dictionaries(
    {
        "key": st.integers(min_value=0, max_value=15),
        "ck": st.integers(min_value=0, max_value=5),
        "col": st.sampled_from(["a", "b"]),
        "value": st.text(alphabet="rs", min_size=1, max_size=3),
        "ts": TS,
    }
)


@given(
    gens=st.lists(st.lists(clustered_write, max_size=10), min_size=1, max_size=3),
    splits=st.integers(1, 3),
)
@settings(max_examples=80, deadline=None)
def test_clustered_randomized_matches_model(tmp_path_factory, gens, splits):
    """CQL3 mode: composite cells group into rows per (key, ck); cell
    LWW applies per (key, ck, field) across generations."""
    tmp = str(tmp_path_factory.mktemp("cqlprop"))
    kenc = get_validator("LongType").encode
    ckv = get_validator("Int32Type")
    schema = {
        "key": ["k", "LongType"],
        "columns": [["a", "UTF8Type"], ["b", "UTF8Type"]],
        "clustering": [["ck", "Int32Type"]],
    }
    for g, writes in enumerate(gens, start=1):
        by_key: dict[int, list[Cell]] = {}
        for w_ in writes:
            prefix = [ckv.encode(w_["ck"])]
            cells = by_key.setdefault(w_["key"], [])
            cells.append(Cell(encode_composite(prefix + [b""]), b"", w_["ts"]))
            cells.append(
                Cell(
                    encode_composite(prefix + [w_["col"].encode()]),
                    w_["value"].encode(),
                    w_["ts"],
                )
            )
        w = SSTableWriter(tmp, "ks", "cqlprop", g, schema, chunk_len=256)
        for key in sorted(by_key):
            w.append(Partition(kenc(key), cells=by_key[key]))
        w.close()

    # model: LWW per (key, ck, field); a written (key, ck) always has a
    # live row marker, so every touched row exists
    best: dict[tuple[int, int, str], tuple] = {}
    for g, writes in enumerate(gens, start=1):
        for w_ in writes:
            kcf = (w_["key"], w_["ck"], w_["col"])
            rank = (w_["ts"], False, w_["value"].encode(), g)
            cur = best.get(kcf)
            if cur is None or rank > cur:
                best[kcf] = rank
    expected: dict[tuple[int, int], dict[str, str]] = {}
    for writes in gens:
        for w_ in writes:
            expected.setdefault((w_["key"], w_["ck"]), {})
    for (k, ck, col), (ts, _t, val, _g) in best.items():
        expected[(k, ck)][col] = val.decode()

    reader = SSTableDataSourceReader({"path": tmp, "splits": str(splits)}, None)
    got: dict[tuple[int, int], dict[str, str]] = {}
    for p in reader.partitions():
        for item in reader.read(p):
            rows_out = (
                [tuple(d.values()) for d in item.to_pylist()]
                if isinstance(item, pa.RecordBatch)
                else [tuple(item)]
            )
            for k, ck, a, b in rows_out:
                assert (k, ck) not in got, "duplicate CQL3 row emitted"
                got[(k, ck)] = {n: v for n, v in zip("ab", (a, b)) if v is not None}
    assert got == expected


coll_write = st.fixed_dictionaries(
    {
        "key": st.integers(0, 8),
        "ck": st.integers(0, 3),
        "kind": st.sampled_from(["list", "set", "map"]),
        "ckey": st.integers(0, 5),  # list position / set element / map key
        # min_size=0: live empty values are real list elements / map
        # values and must survive decode (regression: truthiness filter
        # used to drop them)
        "value": st.text(alphabet="pqr", min_size=0, max_size=4),
        "ts": TS,
    }
)


@given(gens=st.lists(st.lists(coll_write, max_size=10), min_size=1, max_size=4),
       splits=st.integers(1, 4))
@settings(max_examples=100, deadline=None)
def test_collections_randomized_matches_model(tmp_path_factory, gens, splits):
    """CQL3 collections: element cells (composite name = ck, column,
    collection-key) reconcile per element across generations — list
    positions and map keys LWW independently, set membership is cell
    presence — and reassemble into array/array/map output columns."""
    import struct as _struct

    tmp = str(tmp_path_factory.mktemp("collprop"))
    kenc = get_validator("LongType").encode
    ckv = get_validator("Int32Type")
    i32 = get_validator("Int32Type")
    schema = {
        "key": ["k", "LongType"],
        "columns": [],
        "clustering": [["ck", "Int32Type"]],
        "collections": [
            ["lst", "list", "UTF8Type"],
            ["st_", "set", "Int32Type"],
            ["mp", "map", "Int32Type", "UTF8Type"],
        ],
    }
    colname = {"list": b"lst", "set": b"st_", "map": b"mp"}

    def coll_key(kind: str, ckey: int) -> bytes:
        if kind == "list":
            return _struct.pack(">QQ", 0, ckey)  # position uuid stand-in
        return i32.encode(ckey)

    for g, writes in enumerate(gens, start=1):
        by_key: dict[int, list[Cell]] = {}
        for w_ in writes:
            prefix = [ckv.encode(w_["ck"])]
            cells = by_key.setdefault(w_["key"], [])
            cells.append(Cell(encode_composite(prefix + [b""]), b"", w_["ts"]))
            value = b"" if w_["kind"] == "set" else w_["value"].encode()
            cells.append(
                Cell(
                    encode_composite(
                        prefix + [colname[w_["kind"]], coll_key(w_["kind"], w_["ckey"])]
                    ),
                    value,
                    w_["ts"],
                )
            )
        w = SSTableWriter(tmp, "ks", "collprop", g, schema, chunk_len=256)
        for key in sorted(by_key):
            w.append(Partition(kenc(key), cells=by_key[key]))
        w.close()

    # model: LWW per (key, ck, kind, ckey) with the (ts, tomb, value,
    # gen) rank the cell reconciler uses
    best: dict[tuple[int, int, str, int], tuple] = {}
    rows: set[tuple[int, int]] = set()
    for g, writes in enumerate(gens, start=1):
        for w_ in writes:
            rows.add((w_["key"], w_["ck"]))
            kcf = (w_["key"], w_["ck"], w_["kind"], w_["ckey"])
            value = b"" if w_["kind"] == "set" else w_["value"].encode()
            rank = (w_["ts"], False, value, g)
            cur = best.get(kcf)
            if cur is None or rank > cur:
                best[kcf] = rank
    expected: dict[tuple[int, int], tuple] = {}
    for k, ck in rows:
        lst = [
            best[(k, ck, "list", p)][2].decode()
            for p in sorted(
                p for (bk, bck, kind, p) in best if (bk, bck, kind) == (k, ck, "list")
            )
        ]
        st_elems = sorted(
            e for (bk, bck, kind, e) in best if (bk, bck, kind) == (k, ck, "set")
        )
        mp = {
            mk: best[(k, ck, "map", mk)][2].decode()
            for (bk, bck, kind, mk) in best
            if (bk, bck, kind) == (k, ck, "map")
        }
        expected[(k, ck)] = (lst or None, st_elems or None, mp or None)

    reader = SSTableDataSourceReader({"path": tmp, "splits": str(splits)}, None)
    got: dict[tuple[int, int], tuple] = {}
    for p in reader.partitions():
        for item in reader.read(p):
            rows_out = (
                [tuple(d.values()) for d in item.to_pylist()]
                if isinstance(item, pa.RecordBatch)
                else [tuple(item)]
            )
            for k, ck, lst, st_e, mp in rows_out:
                assert (k, ck) not in got, "duplicate CQL3 row emitted"
                # arrow map columns surface as [(k, v), ...] pairs
                if isinstance(mp, list):
                    mp = dict(mp)
                got[(k, ck)] = (
                    list(lst) if lst is not None else None,
                    list(st_e) if st_e is not None else None,
                    mp,
                )
    assert got == expected


slice_gen = st.lists(
    st.fixed_dictionaries(
        {
            "key": st.integers(0, 5),
            "ck": st.text(alphabet="abcdef", min_size=1, max_size=3),
            "col": st.sampled_from(["x", "y"]),
            "value": st.text(alphabet="uvw", min_size=1, max_size=6),
            "ts": TS,
        }
    ),
    max_size=20,
)


@given(
    gens=st.lists(slice_gen, min_size=1, max_size=3),
    lo=st.one_of(st.none(), st.text(alphabet="abcdef", min_size=1, max_size=2)),
    hi=st.one_of(st.none(), st.text(alphabet="abcdef", min_size=1, max_size=2)),
    add_rt=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_scan_slices_matches_full_scan_within_bounds(tmp_path_factory, gens, lo, hi, add_rt):
    """Promoted-column-index sliced reads must return exactly the full
    scan's cells restricted to the name bounds, plus identical partition
    headers — for every partition, including range-tombstone carriers
    (which fall back to full-partition reads)."""
    from cassowary_spark.sources.sstable_format import SSTableReader as R

    tmp = str(tmp_path_factory.mktemp("slice"))
    kenc = get_validator("LongType").encode
    ckv = get_validator("UTF8Type")
    schema = {
        "key": ["k", "LongType"],
        "columns": [["x", "UTF8Type"], ["y", "UTF8Type"]],
        "clustering": [["ck", "UTF8Type"]],
    }
    for g, writes in enumerate(gens, start=1):
        by_key: dict[int, list[Cell]] = {}
        for w_ in writes:
            prefix = [ckv.encode(w_["ck"])]
            cells = by_key.setdefault(w_["key"], [])
            cells.append(Cell(encode_composite(prefix + [b""]), b"", w_["ts"]))
            cells.append(
                Cell(
                    encode_composite(prefix + [w_["col"].encode()]),
                    w_["value"].encode(),
                    w_["ts"],
                )
            )
        if add_rt and by_key:
            first = sorted(by_key)[0]
            by_key[first].append(
                range_tombstone(
                    encode_composite([ckv.encode("b")]),
                    encode_composite([ckv.encode("c")]) + b"\xff",
                    3,
                )
            )
        # dedupe same-name cells within a generation (memtable invariant)
        w = SSTableWriter(tmp, "ks", "slice", g, schema, chunk_len=128, column_index_len=32)
        for key in sorted(by_key):
            named: dict[bytes, Cell] = {}
            for c in by_key[key]:
                cur = named.get(c.name)
                if cur is None or (c.timestamp, c.value) > (cur.timestamp, cur.value):
                    named[c.name] = c
            w.append(Partition(kenc(key), cells=list(named.values())))
        w.close()

    # typed-order snapshots (what the writer emits for clustered
    # schemas) take bounds in the composite_cmp_key space, plus the
    # matching name_key translator — exactly how the DataSource's
    # _name_bounds/_scan_ranges drive scan_slices
    from cassowary_spark.sources.sstable_format import (
        cmp_component,
        composite_cmp_key,
        discover_sstables,
    )

    vnames = ("UTF8Type",)
    name_key = lambda nm: composite_cmp_key(nm, vnames)  # noqa: E731
    name_lo = cmp_component(ckv.encode(lo), "UTF8Type") if lo is not None else None
    name_hi = (
        (cmp_component(ckv.encode(hi), "UTF8Type")[:-1] + b"\x01")
        if hi is not None
        else None
    )

    def within(name: bytes) -> bool:
        k = name_key(name)
        if name_lo is not None and k < name_lo:
            return False
        if name_hi is not None and k > name_hi:
            return False
        return True

    for r in discover_sstables(tmp):
        r.SLICE_MIN_PARTITION_BYTES = 0  # force the block-skip path
        full = {
            p.key: (p.local_deletion_time, p.marked_for_delete_at,
                    {c.name: (c.value, c.timestamp, c.flags) for c in p.cells})
            for p in r.scan_offsets(0, r._data.total)
        }
        sliced = {
            p.key: (p.local_deletion_time, p.marked_for_delete_at,
                    {c.name: (c.value, c.timestamp, c.flags) for c in p.cells})
            for p in r.scan_slices(0, r._data.total, name_lo, name_hi, name_key)
        }
        assert set(sliced) == set(full)
        for k in full:
            f_ldt, f_mfda, f_cells = full[k]
            s_ldt, s_mfda, s_cells = sliced[k]
            assert (s_ldt, s_mfda) == (f_ldt, f_mfda)
            has_rt = any(fl & 0x08 for _, _, fl in f_cells.values())
            want = (
                f_cells
                if has_rt
                else {n: c for n, c in f_cells.items() if within(n)}
            )
            # sliced may include extra cells from partially-covered
            # blocks — must be a superset of in-bounds, subset of full
            for n, c in want.items():
                assert s_cells.get(n) == c, (k, n)
            for n in s_cells:
                assert n in f_cells


# ------------------------------------------- value-level slice pushdown

# Variable-length clustering values whose byte-encoded composites sort
# DIFFERENTLY from their string values across lengths (enc('b') <
# enc('ab') byte-wise although 'b' > 'ab') — the exact shape that made
# range-derived name bounds drop rows before bounds were restricted to
# EQ predicates.
_CK_VALUES = [
    a + b + c + d
    for a in "ab"
    for b in ["", "a", "b"]
    for c in ["", "a", "b"]
    for d in ["", "a", "b"]
]

_pred = st.tuples(
    st.sampled_from(["eq", "gt", "ge", "lt", "le"]),
    st.text(alphabet="ab", min_size=0, max_size=4),
)


@given(preds=st.lists(_pred, min_size=1, max_size=2))
@settings(max_examples=60, deadline=None)
def test_cluster_slice_predicates_value_exact(tmp_path_factory, preds):
    """Value-level gt/ge/lt/le/eq clustering predicates pushed through
    the DataSourceReader must return EXACTLY the rows whose decoded
    clustering value satisfies them — including with partitions forced
    onto the promoted-index block-skip path, where any name-byte bound
    derived from a range predicate over a variable-length validator
    would silently drop matching blocks."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    from cassowary_spark.sources.sstable_format import SSTableReader as R

    tmp = str(tmp_path_factory.mktemp("valslice"))
    kenc = get_validator("LongType").encode
    ckv = get_validator("UTF8Type")
    schema = {
        "key": ["k", "LongType"],
        "columns": [["x", "UTF8Type"]],
        "clustering": [["ck", "UTF8Type"]],
    }
    cells = []
    for i, ck in enumerate(sorted(_CK_VALUES)):
        prefix = [ckv.encode(ck)]
        cells.append(Cell(encode_composite(prefix + [b""]), b"", 1))
        cells.append(Cell(encode_composite(prefix + [b"x"]), f"v{i}".encode(), 1))
    w = SSTableWriter(tmp, "ks", "valslice", 1, schema, chunk_len=128, column_index_len=32)
    w.append(Partition(kenc(7), cells=cells))
    w.close()

    _FCLS = {
        "eq": EqualTo,
        "gt": GreaterThan,
        "ge": GreaterThanOrEqual,
        "lt": LessThan,
        "le": LessThanOrEqual,
    }
    _PYOPS = {
        "eq": lambda a, b: a == b,
        "gt": lambda a, b: a > b,
        "ge": lambda a, b: a >= b,
        "lt": lambda a, b: a < b,
        "le": lambda a, b: a <= b,
    }
    expected = {
        ck for ck in _CK_VALUES if all(_PYOPS[op](ck, v) for op, v in preds)
    }

    saved = R.SLICE_MIN_PARTITION_BYTES
    R.SLICE_MIN_PARTITION_BYTES = 0  # every partition block-skips
    try:
        reader = SSTableDataSourceReader({"path": tmp}, None)
        leftover = list(
            reader.pushFilters([_FCLS[op](("ck",), v) for op, v in preds])
        )
        assert leftover == [], "clustering predicates must be fully consumed"
        got = set()
        for p in reader.partitions():
            for item in reader.read(p):
                rows_out = (
                    [tuple(d.values()) for d in item.to_pylist()]
                    if isinstance(item, pa.RecordBatch)
                    else [tuple(item)]
                )
                for _k, ck, _x in rows_out:
                    assert ck not in got, "duplicate row emitted"
                    got.add(ck)
    finally:
        R.SLICE_MIN_PARTITION_BYTES = saved
    assert got == expected


def test_range_slice_skips_blocks_io_level(tmp_path_factory):
    """Typed-order snapshots serve value-RANGE clustering slices from
    the promoted index at the I/O level: a bounded read must touch
    strictly fewer data bytes than the unbounded read, with
    variable-length UTF8 clustering values (the shape whose raw-byte
    order diverges from value order)."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from cassowary_spark.sources.sstable_format import SSTableReader as R

    tmp = str(tmp_path_factory.mktemp("ioskip"))
    kenc = get_validator("LongType").encode
    ckv = get_validator("UTF8Type")
    schema = {
        "key": ["k", "LongType"],
        "columns": [["x", "UTF8Type"]],
        "clustering": [["ck", "UTF8Type"]],
    }
    # one fat partition, many variable-length cks, small blocks
    cks = sorted(
        f"{a}{'x' * (i % 7)}{i:03d}" for i, a in enumerate("abcdefghij" * 40)
    )
    cells = []
    for i, ck in enumerate(cks):
        prefix = [ckv.encode(ck)]
        cells.append(Cell(encode_composite(prefix + [b""]), b"", 1))
        cells.append(
            Cell(encode_composite(prefix + [b"x"]), f"value{i:04d}".encode(), 1)
        )
    w = SSTableWriter(
        tmp, "ks", "ioskip", 1, schema, chunk_len=256, column_index_len=64
    )
    w.append(Partition(kenc(1), cells=cells))
    w.close()

    def bytes_read(preds) -> tuple[int, int]:
        reader = SSTableDataSourceReader({"path": tmp}, None)
        assert reader._typed_order
        list(reader.pushFilters(preds))
        spans = []
        saved_min = R.SLICE_MIN_PARTITION_BYTES
        R.SLICE_MIN_PARTITION_BYTES = 0
        try:
            parts = reader.partitions()
            from cassowary_spark.sources import sstable_format as fmt

            orig = fmt._ChunkedData.read_range

            def spy(self, start, end):
                spans.append(max(0, end - start))
                return orig(self, start, end)

            fmt._ChunkedData.read_range = spy
            try:
                n = 0
                for p in parts:
                    for item in reader.read(p):
                        n += item.num_rows if hasattr(item, "num_rows") else 1
            finally:
                fmt._ChunkedData.read_range = orig
        finally:
            R.SLICE_MIN_PARTITION_BYTES = saved_min
        return n, sum(spans)

    n_all, full_bytes = bytes_read([])
    n_slice, slice_bytes = bytes_read(
        [GreaterThanOrEqual(("ck",), "d"), LessThan(("ck",), "e")]
    )
    assert n_all == len(cks)
    assert n_slice == sum(1 for ck in cks if "d" <= ck < "e")
    assert 0 < slice_bytes < full_bytes / 2, (slice_bytes, full_bytes)


def test_mixed_order_generations_disable_slice_bounds(tmp_path_factory):
    """A dir mixing a legacy raw-sorted generation with a typed-order
    one must NOT push clustering-slice name bounds: either bound space
    bisects the other order's blocks incorrectly. The eq slice must
    return exactly what the unbounded scan + exact predicate does."""
    from pyspark.sql.datasource import EqualTo

    from cassowary_spark.sources.sstable_format import SSTableReader as R

    tmp = str(tmp_path_factory.mktemp("mixed"))
    kenc = get_validator("LongType").encode
    ckv = get_validator("UTF8Type")
    schema = {
        "key": ["k", "LongType"],
        "columns": [["x", "UTF8Type"]],
        "clustering": [["ck", "UTF8Type"]],
    }
    # variable-length cks whose raw order diverges from value order
    cks = ["a", "ab", "abb", "b", "bb", "c"]

    def write_gen(gen, legacy):
        w = SSTableWriter(tmp, "ks", "mixed", gen, schema, chunk_len=128,
                          column_index_len=32)
        if legacy:
            w._cluster_vnames = None  # raw-byte sort, no cell_order stamp
        cells = []
        for i, ck in enumerate(sorted(cks)):
            prefix = [ckv.encode(ck)]
            cells.append(Cell(encode_composite(prefix + [b""]), b"", gen))
            cells.append(
                Cell(encode_composite(prefix + [b"x"]),
                     f"g{gen}-{i}".encode(), gen)
            )
        w.append(Partition(kenc(1), cells=cells))
        w.close()

    write_gen(1, legacy=True)
    write_gen(2, legacy=False)

    saved = R.SLICE_MIN_PARTITION_BYTES
    R.SLICE_MIN_PARTITION_BYTES = 0  # force block-skipping if bounds exist
    try:
        reader = SSTableDataSourceReader({"path": tmp}, None)
        assert not reader._typed_order and not reader._legacy_order
        list(reader.pushFilters([EqualTo(("ck",), "b")]))
        assert reader._name_bounds() == (None, None)
        got = set()
        for p in reader.partitions():
            for item in reader.read(p):
                rows = (
                    [tuple(d.values()) for d in item.to_pylist()]
                    if isinstance(item, pa.RecordBatch)
                    else [tuple(item)]
                )
                got.update(rows)
    finally:
        R.SLICE_MIN_PARTITION_BYTES = saved
    # gen2 wins LWW for ck='b' (higher ts); exactly one row survives
    assert got == {(1, "b", "g2-3")}
