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
    FLAG_EXPIRING,
    FLAG_TOMBSTONE,
    Cell,
    Partition,
    SSTableWriter,
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

generation = st.lists(
    st.fixed_dictionaries(
        {
            "key": KEYS,
            "row_tomb": st.one_of(st.none(), TS),
            "cells": st.lists(cell_write, max_size=4),
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
        slot = by_key.setdefault(r["key"], {"row_tomb": None, "cells": []})
        if r["row_tomb"] is not None:
            slot["row_tomb"] = max(slot["row_tomb"] or 0, r["row_tomb"])
        slot["cells"].extend(r["cells"])
    return by_key


def _model(gens) -> dict[int, dict[str, str | None]]:
    """Independent reference model of Cassandra merge semantics."""
    acc: dict[int, dict] = {}
    for g, rows in enumerate(gens, start=1):
        for key, slot in _dedupe_generation(rows).items():
            m = acc.setdefault(key, {"tomb": None, "cells": {}})
            if slot["row_tomb"] is not None:
                m["tomb"] = max(m["tomb"] or 0, slot["row_tomb"])
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
                    cells=[_mk_cell(c) for c in slot["cells"]],
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
