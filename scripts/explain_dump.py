#!/usr/bin/env python
"""Dump .explain("formatted") for selected queries to plans/<tag>/.

Usage: python scripts/explain_dump.py <tag> q_a,q_b,...   (tag e.g. r14)
Writes plans/<tag>/<query>_<suffix>.txt where suffix comes from
$EXPLAIN_SUFFIX (default "before").

Plans are captured at the bench scale factor ($SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.1) on the same session config bench.py
uses, so Exchange counts / join strategies / PushedFilters match what
the bench actually executes (modulo AQE runtime re-planning, which
explain() shows as the initial plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassowary_spark import registry
from cassowary_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    suffix = os.environ.get("EXPLAIN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark("explain_dump")
    for n in names:
        if n not in registry.QUERIES:
            print(f"skip {n}: not registered")
            continue
        df = registry.QUERIES[n](spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange)")
    spark.stop()


if __name__ == "__main__":
    main()
