#!/usr/bin/env python
"""Generate the sf100 DOCUMENTS fixture (10x sf10 = 1000x sf0.1) —
the third-decade spot-check for the re-linearized shingle-pair
family ONLY (r12 verdict #3 / SURVEY round-13 queue #4).

The four family keys (q_dedup_ngram / q_dedup_near_verified /
q_shingle_containment / q_dedup_clusters) read nothing but the
documents table, so this writes just documents.parquet (~600 MB;
a full sf100 set would be ~16 GB for nothing the probe touches).
Same deterministic replication protocol as gen_sf10_fixtures.py, one
decade up: doc_id stride 500k (10x the sf10 stride), replicas i > 0
append a third marker token (" t{i}") so dedup sees 1000x the
corpus, not copies; n_chars fixed up to match.

Output: /root/repo/.scratch/sf100/documents.parquet (gitignored).
Idempotent — skips if present unless --force.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, ".scratch", "sf10", "documents.parquet")
OUT_DIR = os.path.join(ROOT, ".scratch", "sf100")
OUT = os.path.join(OUT_DIR, "documents.parquet")
REPLICAS = 10
DOC_ID_STRIDE = 500_000  # 10x the sf10 stride (dense by construction)


def main() -> None:
    force = "--force" in sys.argv
    if os.path.exists(OUT) and not force:
        print("skip documents (exists)")
        return
    if not os.path.exists(SRC):
        sys.exit("run scripts/gen_sf10_fixtures.py first (needs .scratch/sf10)")
    os.makedirs(OUT_DIR, exist_ok=True)
    tbl = pq.read_table(SRC)
    parts = []
    for i in range(REPLICAS):
        rep = tbl
        if i > 0:
            rep = rep.set_column(
                rep.column_names.index("doc_id"),
                "doc_id",
                pc.add(rep["doc_id"], i * DOC_ID_STRIDE),
            )
            marker = f" t{i}"
            text = pc.binary_join_element_wise(
                rep["text"].combine_chunks().cast(pa.string()),
                pa.array([marker] * len(rep), pa.string()),
                "",
            )
            rep = rep.set_column(
                rep.column_names.index("text"), "text", text
            ).set_column(
                rep.column_names.index("n_chars"),
                "n_chars",
                pc.add(rep["n_chars"], len(marker)),
            )
        parts.append(rep.cast(tbl.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, OUT, row_group_size=256_000)
    print(f"wrote documents: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
