"""Planted-input tests for the analytics operators (C52-C60, B43-B46)
— semantics the fixture-wide oracle parity can't pin down: funnel
ORDER matters (a purchase before the click must not convert), the
retention triangle must place a planted user in exactly its active
week offsets, identical corpus halves must show zero drift, a planted
extreme value must trip MAD but a shifted-mean user must not, and the
transition matrix rows must sum to one.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_events(tmp_path, rows):
    """rows = (event_id, ts, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    """rows = (doc_id, text)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["src0"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _m(minutes):
    return BASE + dt.timedelta(minutes=minutes)


class TestFunnelOrdering:
    def test_out_of_order_purchase_does_not_convert(self, spark, tmp_path):
        """User 1 converts in order; user 2 purchases BEFORE clicking
        (no stage-3 credit); user 3 clicks before viewing (no stage-2
        credit)."""
        rows = [
            (1, _m(0), 1, "view", 1.0),
            (2, _m(1), 1, "click", 1.0),
            (3, _m(2), 1, "purchase", 1.0),
            (4, _m(0), 2, "view", 1.0),
            (5, _m(1), 2, "purchase", 1.0),
            (6, _m(2), 2, "click", 1.0),
            (7, _m(0), 3, "click", 1.0),
            (8, _m(1), 3, "view", 1.0),
        ]
        d = _write_events(tmp_path, rows)
        out = {r["stage"]: r for r in QUERIES["q_funnel"](spark, d).collect()}
        assert out[1]["n_users"] == 3  # everyone viewed
        assert out[2]["n_users"] == 2  # users 1, 2 clicked after viewing
        assert out[3]["n_users"] == 1  # only user 1 purchased after clicking


class TestRetentionGrid:
    def test_planted_user_active_weeks(self, spark, tmp_path):
        """A user active on its first day and exactly 15 days later
        lands in week offsets 0 and 2, nothing else."""
        rows = [
            (1, _m(0), 7, "view", 1.0),
            (2, _m(15 * 24 * 60), 7, "view", 1.0),
        ]
        d = _write_events(tmp_path, rows)
        got = {
            (r["cohort_week"], r["week_offset"]): r["n_users"]
            for r in QUERIES["q_retention"](spark, d).collect()
        }
        # 2024-01-01 is a Monday — its own cohort anchor
        assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1}


class TestDistributionDrift:
    def test_identical_halves_zero_drift(self, spark, tmp_path):
        """Even/odd halves with identical token multisets: every
        per-term KL contribution must be exactly 0."""
        rows = [(0, "alpha beta beta"), (1, "alpha beta beta"),
                (2, "gamma alpha"), (3, "gamma alpha")]
        d = _write_docs(tmp_path, rows)
        out = QUERIES["q_distribution_drift"](spark, d).collect()
        assert {r["term"] for r in out} == {"alpha", "beta", "gamma"}
        assert all(r["kl_term"] == 0.0 for r in out), out
        assert all(r["c_a"] == r["c_b"] for r in out)


class TestMadOutliers:
    def test_planted_extreme_flagged_shifted_mean_not(self, spark, tmp_path):
        """User 1: ten ~5.0 values plus one 500.0 — the extreme is
        flagged. User 2: ten tightly-spread values around 1000 (big
        mean, no outlier) — nothing flagged."""
        rows = []
        eid = 0
        for i in range(10):
            rows.append((eid, _m(i), 1, "view", 5.0 + (i % 3) * 0.5)); eid += 1
        rows.append((eid, _m(20), 1, "view", 500.0)); eid += 1
        for i in range(11):
            rows.append((eid, _m(i), 2, "view", 1000.0 + (i % 5) * 0.25)); eid += 1
        d = _write_events(tmp_path, rows)
        out = QUERIES["q_mad_outliers"](spark, d).collect()
        assert [(r["user_id"], r["value"]) for r in out] == [(1, 500.0)]


class TestEventTransitions:
    def test_rows_normalize_and_order_matters(self, spark, tmp_path):
        """view->click twice and view->purchase once for one user:
        p(view->click)=2/3, p(view->purchase)=1/3; transitions never
        cross user boundaries."""
        rows = [
            (1, _m(0), 1, "view", 1.0),
            (2, _m(1), 1, "click", 1.0),
            (3, _m(2), 1, "view", 1.0),
            (4, _m(3), 1, "click", 1.0),
            (5, _m(4), 1, "view", 1.0),
            (6, _m(5), 1, "purchase", 1.0),
            # user 2's lone event: must create no cross-user pair
            (7, _m(6), 2, "error", 1.0),
        ]
        d = _write_events(tmp_path, rows)
        out = QUERIES["q_event_transitions"](spark, d).collect()
        got = {(r["from_type"], r["to_type"]): (r["n"], r["p"]) for r in out}
        assert got[("view", "click")] == (2, 0.6667)
        assert got[("view", "purchase")] == (1, 0.3333)
        assert got[("click", "view")] == (2, 1.0)
        assert not any(ft == "error" or tt == "error" for ft, tt in got)


class TestTrailingRate:
    def test_window_anchors_per_event(self, spark, tmp_path):
        """Events at t=0, 30 min, 90 min: the third sees only the
        second (the first is 90 min back, outside the trailing hour)."""
        rows = [
            (1, _m(0), 1, "view", 1.0),
            (2, _m(30), 1, "view", 1.0),
            (3, _m(90), 1, "view", 1.0),
        ]
        d = _write_events(tmp_path, rows)
        got = {
            r["event_id"]: r["n_trailing_hour"]
            for r in QUERIES["q_trailing_rate"](spark, d).collect()
        }
        assert got == {1: 1, 2: 2, 3: 2}


class TestProfileStatsApprox:
    def test_hll_twin_agrees_and_drops_the_expand(self, spark, sf_dir):
        """approx=True (C54 production path): n_distinct within the
        HLL rsd=2% envelope of exact (generous 3x slack for small
        fixtures), every other column bit-identical, and the plan
        loses the countDistinct Expand rewrite (the wide shuffle the
        twin exists to remove)."""
        from cassowary_spark.plancheck import formatted_plan

        exact = {
            r.col_name: r
            for r in QUERIES["q_profile_stats"](spark, sf_dir).collect()
        }
        approx_df = QUERIES["q_profile_stats"](spark, sf_dir, approx=True)
        assert "Expand" not in formatted_plan(approx_df)
        approx = {r.col_name: r for r in approx_df.collect()}
        assert set(approx) == set(exact)
        for c, r in approx.items():
            e = exact[c]
            assert abs(r.n_distinct - e.n_distinct) <= max(
                2, 0.06 * e.n_distinct
            ), (c, r.n_distinct, e.n_distinct)
            assert (r.n_rows, r.n_nonnull) == (e.n_rows, e.n_nonnull)
            assert (r.min_val, r.max_val, r.mean_val) == (
                e.min_val,
                e.max_val,
                e.mean_val,
            )
