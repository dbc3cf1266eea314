#!/usr/bin/env python
"""Screen every registered query's physical plan for repeated scans
of the same base parquet table (a branch that re-reads the corpus —
the guide §1.3 plan-branch-dedup smell). Persisted frames plan as
InMemoryRelation, so any duplicated base-table scan reported here is
genuinely re-executed.

Usage: python scripts/scan_dup_screen.py [out.json]
Prints keys with >=2 scans of any one fixture table, worst first.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassowary_spark import registry
from cassowary_spark.session import get_spark

TABLES = (
    "lineitem", "orders", "events", "documents", "embeddings",
    "customer", "part", "partsupp", "supplier", "nation", "region",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("scan_dup_screen")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    names = sorted(registry.QUERIES)
    if os.environ.get("SCREEN_QUERIES"):
        names = [n for n in os.environ["SCREEN_QUERIES"].split(",") if n in names]
    def live_scans(jplan, acc):
        """Count FileSourceScan leaves NOT under an InMemoryTableScan
        (cached frames execute their child plan once; reprints under
        each cache reference are not re-executed scans)."""
        cls = jplan.getClass().getSimpleName()
        if "InMemoryTableScan" in cls:
            return
        if "AdaptiveSparkPlan" in cls:
            live_scans(jplan.inputPlan(), acc)
            return
        if "QueryStage" in cls:
            live_scans(jplan.plan(), acc)
            return
        if "FileSourceScan" in cls or "BatchScan" in cls:
            s = jplan.toString().split("\n")[0]
            for t in TABLES:
                if re.search(rf"{t}\.parquet", s):
                    acc[t] = acc.get(t, 0) + 1
            return
        it = jplan.children().iterator()
        while it.hasNext():
            live_scans(it.next(), acc)
        # subqueries (scalar/inlist) execute separately too
        it2 = jplan.subqueries().iterator()
        while it2.hasNext():
            live_scans(it2.next(), acc)

    for n in names:
        try:
            df = registry.QUERIES[n](spark, sf_dir)
            counts = {}
            live_scans(df._jdf.queryExecution().executedPlan(), counts)
        except Exception as ex:  # noqa: BLE001
            out[n] = {"error": str(ex)[:200]}
            continue
        dups = {t: c for t, c in counts.items() if c >= 2}
        if dups:
            out[n] = dups
    spark.stop()
    ranked = sorted(out.items(), key=lambda kv: -max(
        (v for v in kv[1].values() if isinstance(v, int)), default=0))
    for n, d in ranked:
        print(n, d)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
