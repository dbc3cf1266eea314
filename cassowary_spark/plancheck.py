"""Shared physical-plan inspection helpers.

One definition of "how we read a plan" for the plan-audit tests
(tests/test_plans.py), the shuffle-budget guard
(tests/test_plan_budget.py), and the budget generator
(scripts/gen_plan_budgets.py) — if the counting rule ever changes
(e.g. to recognize an AQE node spelling), every consumer moves
together instead of the generator and the guard drifting apart.

Node counts use the DETAIL section of ``explain("formatted")``:
every physical node appears there exactly once as ``(<n>) <Name>``,
so counting ``") <Name>"`` counts nodes, not tree-indentation
artifacts.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The full ``explain("formatted")`` text (pre-AQE plan)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def node_counts(df: DataFrame) -> dict[str, int]:
    """Shuffle-relevant node counts for budget checks.

    Counted on the CACHE-FREE plan: queries that persist() a reused
    sub-aggregate get cache-substituted (InMemoryRelation) at physical
    planning, and whether the substitution appears depends on what an
    earlier test in the same session left cached — clearing first
    makes the count a pure function of the query, not of session
    history.
    """
    df.sparkSession.catalog.clearCache()
    p = formatted_plan(df)
    return {
        "exchanges": p.count(") Exchange"),
        "broadcasts": p.count(") BroadcastExchange"),
        "scans": p.count(") Scan ") + p.count(") BatchScan"),
        "cartesian": p.count(") CartesianProduct"),
    }
