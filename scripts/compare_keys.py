#!/usr/bin/env python
"""Oracle-compare NAMED registry keys at a given fixture dir.

Usage: python scripts/compare_keys.py <sf_dir> q_a,q_b,...
Runs the same row-count + schema + order-insensitive value-hash
compare the driver uses (cassowary_spark.oracle.compare) on a vanilla
session, from any cwd. Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassowary_spark import registry
from cassowary_spark.oracle import compare, duck_connection
from cassowary_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    registry.load_all()
    spark = get_spark("compare_keys")
    con = duck_connection(sf_dir)
    failed = []
    for n in names:
        if n not in registry.QUERIES:
            print(f"SKIP {n}: not registered")
            continue
        if n not in registry.ORACLES:
            print(f"SKIP {n}: rows-only (no oracle)")
            continue
        try:
            compare(registry.QUERIES[n](spark, sf_dir), registry.ORACLES[n], con, n)
            print("PASS " + n)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {n}: {exc}")
            failed.append(n)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
