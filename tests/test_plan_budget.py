"""Shuffle-budget regression guard: every registered query's physical
plan must stay within its checked-in Exchange budget
(tests/plan_budgets.json, regenerated via scripts/gen_plan_budgets.py).

At 100 TB an extra Exchange is the difference between a report and an
outage; this test turns "someone's refactor added a shuffle" from a
silent perf cliff into a red test whose fix is either restoring the
plan or consciously committing a higher budget.
"""

from __future__ import annotations

import json
import os

import pytest

from cassowary_spark import registry
from cassowary_spark.plancheck import node_counts

registry.load_all()

BUDGET_PATH = os.path.join(os.path.dirname(__file__), "plan_budgets.json")
with open(BUDGET_PATH) as _f:
    BUDGETS = json.load(_f)


def test_every_query_has_a_budget():
    """A new operator must land with a conscious shuffle budget."""
    missing = sorted(set(registry.QUERIES) - set(BUDGETS))
    assert not missing, (
        f"queries without a plan budget: {missing} — run "
        "scripts/gen_plan_budgets.py and review+commit the diff"
    )


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_exchange_budget(name, spark, sf_dir):
    if name not in registry.QUERIES:
        pytest.skip("budget for a removed query")
    got = node_counts(registry.QUERIES[name](spark, sf_dir))
    assert got["cartesian"] == 0, f"{name}: cartesian product appeared"
    assert got["exchanges"] <= BUDGETS[name]["exchanges"], (
        f"{name}: plan now has {got['exchanges']} exchanges, budget is "
        f"{BUDGETS[name]['exchanges']} — an extra shuffle crept in "
        "(restore the plan or consciously regen the budget)"
    )
    # the r9 "weak" class, pinned per query: a Window ranking a
    # corpus-sized frame in ONE task may exist only where the budget
    # consciously records one (the exact ntile/row_number oracle
    # contracts — every one of which ships an approx=True or
    # repartitionByRange production path in its docstring)
    assert got["sp_corpus_windows"] <= BUDGETS[name].get(
        "sp_corpus_windows", 0
    ), (
        f"{name}: a single-partition corpus-frame Window appeared "
        f"({got['sp_corpus_windows']} > "
        f"{BUDGETS[name].get('sp_corpus_windows', 0)}) — collapse the "
        "frame first (operators/ranks counts idiom), select with "
        "orderBy+limit (TakeOrdered), or ship an approx production "
        "path before consciously regenerating the budget"
    )
    # the r11 verdict's WindowExec "warning budget": every
    # SinglePartition-distributed Window — corpus-framed OR
    # domain-bounded — is exactly one "No Partition Defined for
    # Window" log line at runtime; pin the per-query count so an
    # unbudgeted single-task window (even a scale-fine one over a
    # counts frame) is a red test, not bench-tail log noise
    assert got["sp_windows_total"] <= BUDGETS[name].get(
        "sp_windows_total", 0
    ), (
        f"{name}: plan has {got['sp_windows_total']} "
        "SinglePartition Windows, budget is "
        f"{BUDGETS[name].get('sp_windows_total', 0)} — each one is a "
        "WindowExec warning; partition it, collapse to counts, or "
        "consciously regen the budget"
    )


def test_sp_corpus_windows_ratchet_is_zero_everywhere():
    """r12 ratchet: the LAST two exact-form positional-cut defaults
    (q_rank_fusion, q_zorder_layout) were re-authored ties-together in
    round 12, taking the repo-wide single-partition-corpus-window count
    to ZERO. This pins the sum at 0 so no future budget regen can
    quietly re-admit the scale-killer plan shape — a new entry >0 must
    delete this test, i.e. be a conscious, reviewed decision."""
    total = sum(
        v.get("sp_corpus_windows", 0)
        for v in BUDGETS.values()
        if isinstance(v, dict)
    )
    assert total == 0, (
        f"sp_corpus_windows budget sum is {total}, expected 0 — a "
        "single-task corpus window was consciously(?) re-admitted; "
        "use the counts/banding idiom (operators/ranks) instead"
    )
