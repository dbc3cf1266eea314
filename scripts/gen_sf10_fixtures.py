#!/usr/bin/env python
"""Generate an sf10 fixture set (10x sf1 = 100x sf0.1) — the second
decade of the scale rehearsal (r11 verdict #4).

Same deterministic replication protocol as gen_sf1_fixtures.py, one
decade up: read .scratch/sf1 (generate it first) and replicate 10x
with key strides = 10x the sf0.1 strides (the sf1 key spaces are
dense by construction of the first decade). Document replicas i > 0
append a second marker token (" s{i}") so near-dup workloads see
100x the corpus, not copies; n_chars is fixed up to match.

Output: /root/repo/.scratch/sf10/*.parquet (gitignored, ~1.6 GB;
lineitem 60M rows). Idempotent — skips existing tables unless
--force. Budget ~2-4 min.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_sf1_fixtures import COPY_ONLY, KEY_STRIDES  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, ".scratch", "sf1")
OUT = os.path.join(ROOT, ".scratch", "sf10")
REPLICAS = 10


def _replicate(name: str, tbl: pa.Table) -> pa.Table:
    strides = {c: s * 10 for c, s in KEY_STRIDES[name].items()}
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
            marker = f" s{i}"
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
            # second-decade twin of gen_sf1_fixtures' perturbation
            # (distinct dimension block so sf10 replicas of sf1
            # replicas stay non-identical): no perfect-cosine copies
            # of the ANN query vector beyond the planted ones
            import numpy as np

            emb = rep["embedding"].combine_chunks()
            vals = np.array(emb.values, dtype=np.float32)
            dim = len(vals) // len(rep)
            mat = vals.reshape(len(rep), dim)
            mat[:, (i - 1 + dim // 2) % dim] += 0.07
            rep = rep.set_column(
                rep.column_names.index("embedding"),
                "embedding",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.float32()), dim
                ).cast(tbl.schema.field("embedding").type),
            )
        rep = rep.select(tbl.column_names).cast(tbl.schema)
        parts.append(rep)
    return pa.concat_tables(parts)


def main() -> None:
    force = "--force" in sys.argv
    if not os.path.isdir(SRC):
        sys.exit("run scripts/gen_sf1_fixtures.py first (needs .scratch/sf1)")
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
