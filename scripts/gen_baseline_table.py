#!/usr/bin/env python
"""Regenerate BASELINE.md's per-query table from bench JSON files.

Usage: python scripts/gen_baseline_table.py run1.json [run2.json ...]

Takes the per-query MIN across the given bench runs (each itself
min-of-N interleaved passes — see bench.py) and prints the markdown
table block to paste into BASELINE.md, plus the total.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if not runs:
        sys.exit("usage: gen_baseline_table.py bench1.json [bench2.json ...]")
    queries: dict[str, float] = {}
    for r in runs:
        for k, v in r["queries"].items():
            queries[k] = min(queries.get(k, float("inf")), v)
    names = sorted(queries)
    total = sum(queries.values())
    print(f"Total: **{total:.3f} s** across {len(names)} queries\n")
    print("| query | sec | query | sec | query | sec |")
    print("| --- | --- | --- | --- | --- | --- |")
    for i in range(0, len(names), 3):
        cells = []
        for k in names[i : i + 3]:
            cells.append(f"{k} | {queries[k]:g}")
        while len(cells) < 3:
            cells.append(" | ")
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
