#!/usr/bin/env python
"""Regenerate tests/plan_budgets.json: the per-query shuffle budget.

For every registered query, record the count of Exchange /
BroadcastExchange / scan nodes in the pre-AQE physical plan. The
paired test (tests/test_plan_budget.py) fails when a query's Exchange
count EXCEEDS its recorded budget — the "someone added a shuffle
without noticing" guard a 100 TB engine needs — and when a registered
query is missing from the budget (forces a conscious budget entry per
new operator).

Run from the repo root after intentional plan changes:
    python scripts/gen_plan_budgets.py
and commit the diff — the diff IS the review artifact.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassowary_spark import registry
from cassowary_spark.plancheck import node_counts
from cassowary_spark.session import get_spark

SF = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_budgets.json",
)


def main() -> None:
    registry.load_all()
    spark = get_spark("plan_budgets", cpus=8)
    from cassowary_spark.queries import scan as scan_queries

    scan_queries.build_sstable_snapshot(SF)
    scan_queries.build_wide_snapshot(SF)
    scan_queries.build_clustered_snapshot(SF)
    scan_queries.build_rt_snapshot(SF)
    scan_queries.build_collections_snapshot(SF)
    budgets: dict[str, dict[str, int]] = {}
    for name in sorted(registry.QUERIES):
        try:
            budgets[name] = node_counts(registry.QUERIES[name](spark, SF))
        except Exception as exc:  # pragma: no cover - regen-time visibility
            print(f"SKIP {name}: {exc}", file=sys.stderr)
    with open(OUT, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(budgets)} budgets to {OUT}")


if __name__ == "__main__":
    main()
