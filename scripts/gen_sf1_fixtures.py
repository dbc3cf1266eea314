#!/usr/bin/env python
"""Generate an sf1 fixture set (10x sf0.1) for the scale rehearsal.

The driver's fixtures stop at sf0.1 (/root/testdata is read-only), so
every 100 TB claim in this repo is design-grade until something runs
bigger. This script builds a LOCAL sf1 set by deterministic 10x
replication of sf0.1 with key remapping — replica i shifts every
synthetic key by i * stride (the key spaces are dense 0-based, so
stride = the sf0.1 table size), leaving values, dates and
distributions identical per replica:

- lineitem/orders scale to 6M/1.5M rows (fact tables);
- customer/supplier/part scale 10x too (they are SF-scaled in TPC-H);
  region/nation stay fixed (constant-size in TPC-H);
- events scales to 1M rows with 10x the users (same per-user series
  shape, so sessionization/cadence workloads scale by user count);
- documents scales to 50k docs; replica i > 0 appends a marker token
  to each text (and fixes n_chars up) so exact/near-dup workloads see
  10x the corpus, not 10 copies of every document — otherwise every
  dup cluster would inflate 10x and LSH bucket joins would measure a
  pathological fixture, not scaling;
- embeddings scales to 20k vectors (vectors unchanged — centroid and
  ANN workloads key on vec_id).

Replica 0 is byte-identical to sf0.1, so sf1 results are a strict
superset workload. Output: /root/repo/.scratch/sf1/*.parquet
(gitignored; ~1 min, ~250 MB). Idempotent — skips tables whose
output already exists unless --force.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "sf1",
)
REPLICAS = 10

# table -> {column: stride} (stride = sf0.1 key-space size; dense
# 0-based keys verified against the fixtures)
KEY_STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_ONLY = ("region", "nation")


def _replicate(name: str, tbl: pa.Table) -> pa.Table:
    strides = KEY_STRIDES[name]
    parts = []
    for i in range(REPLICAS):
        cols = {}
        for col in tbl.column_names:
            arr = tbl[col]
            if col in strides and i > 0:
                arr = pc.add(arr, i * strides[col])
            cols[col] = arr
        rep = pa.table(cols, schema=None)
        if name == "documents" and i > 0:
            # perturb text so replicas are not exact duplicates
            marker = f" r{i}"
            text = pc.binary_join_element_wise(
                rep["text"].combine_chunks().cast(pa.string()),
                pa.array([marker] * len(rep), pa.string()),
                "",
            )
            n_chars = pc.add(rep["n_chars"], len(marker))
            rep = rep.set_column(
                rep.column_names.index("text"), "text", text
            ).set_column(
                rep.column_names.index("n_chars"), "n_chars", n_chars
            )
        if name == "embeddings" and i > 0:
            # perturb one dimension per replica: byte-identical copies
            # of vec 0 would otherwise be EXTRA perfect matches
            # (cos = 1.0) that break the planted-ANN instance
            # assumption ("only the planted scaled copies tie at the
            # top") — caught by the r12 sf1 parity sweep
            import numpy as np

            emb = rep["embedding"].combine_chunks()
            vals = np.array(emb.values, dtype=np.float32)
            dim = len(vals) // len(rep)
            mat = vals.reshape(len(rep), dim)
            mat[:, (i - 1) % dim] += 0.05
            rep = rep.set_column(
                rep.column_names.index("embedding"),
                "embedding",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.float32()), dim
                ).cast(tbl.schema.field("embedding").type),
            )
        # keep the exact source schema (field types/order)
        rep = rep.select(tbl.column_names).cast(tbl.schema)
        parts.append(rep)
    return pa.concat_tables(parts)


def main() -> None:
    force = "--force" in sys.argv
    os.makedirs(OUT, exist_ok=True)
    for name in COPY_ONLY + tuple(KEY_STRIDES):
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(dst) and not force:
            print(f"skip {name} (exists)")
            continue
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        out = tbl if name in COPY_ONLY else _replicate(name, tbl)
        pq.write_table(out, dst, row_group_size=256_000)
        print(f"wrote {name}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
