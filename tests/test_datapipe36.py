"""Planted gates for wave 38: q_control_chart (C164) and
q_seasonality_strength (C165)."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _write_orders(tmp_path, day_revs, start=dt.datetime(2024, 3, 4)):
    """One order per day with the given o_totalprice."""
    rows = [
        (i + 1, 1, "O", float(r), start + dt.timedelta(days=i))
        for i, r in enumerate(day_revs)
    ]
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestControlChart:
    def test_spike_flags_and_limits_hand_math(self, spark, tmp_path):
        """Flat 100/day with one 200 spike: only the spike breaches
        center + 2.66*mRbar; limits replicate by hand."""
        revs = [100.0] * 10 + [200.0] + [100.0] * 10
        sf = _write_orders(tmp_path, revs)
        rows = QUERIES["q_control_chart"](spark, sf).collect()
        n = len(revs)
        center = (100.0 * 20 + 200.0) * 100 / n  # cents
        mrbar = (10000 + 10000) / (n - 1)  # two 100-dollar jumps
        assert len(rows) == 1
        r = rows[0]
        assert r.day == "2024-03-14"
        assert r.side == "high"
        assert r.cents == 20000
        assert r.center == pytest.approx(_srnd(center / 100.0, 4))
        assert r.ucl == pytest.approx(_srnd((center + 2.66 * mrbar) / 100.0, 4))
        assert r.lcl == pytest.approx(_srnd((center - 2.66 * mrbar) / 100.0, 4))

    def test_flat_series_flags_nothing(self, spark, tmp_path):
        sf = _write_orders(tmp_path, [150.0] * 15)
        assert QUERIES["q_control_chart"](spark, sf).count() == 0

    def test_fixture_sides_consistent(self, spark, sf_dir):
        rows = QUERIES["q_control_chart"](spark, sf_dir).collect()
        for r in rows:
            if r.side == "high":
                assert r.cents / 100.0 > r.ucl - 1e-6
            else:
                assert r.cents / 100.0 < r.lcl + 1e-6


class TestSeasonalityStrength:
    def test_pure_weekly_pattern_is_strong(self, spark, tmp_path):
        """Revenue depends only on the weekday over 8 full weeks →
        remainder variance 0 → strength exactly 1."""
        pattern = [100.0, 220.0, 140.0, 90.0, 310.0, 55.0, 180.0]
        sf = _write_orders(tmp_path, pattern * 8)
        (r,) = QUERIES["q_seasonality_strength"](spark, sf).collect()
        assert r.n_days == 56
        assert r.var_remainder == pytest.approx(0.0, abs=1e-9)
        assert r.strength == pytest.approx(1.0)

    def test_constant_series_strength_zero(self, spark, tmp_path):
        sf = _write_orders(tmp_path, [100.0] * 21)
        (r,) = QUERIES["q_seasonality_strength"](spark, sf).collect()
        assert r.var_total == 0.0
        assert r.strength == 0.0

    def test_weekday_shuffled_series_is_weak(self, spark, tmp_path):
        """A 7-periodic pattern assigned to a NON-7 cycle (period 5)
        spreads across weekdays → weekday means explain little."""
        pattern = [100.0, 220.0, 140.0, 90.0, 310.0]
        sf = _write_orders(tmp_path, pattern * 14)  # 70 days, period 5
        (r,) = QUERIES["q_seasonality_strength"](spark, sf).collect()
        assert 0.0 <= r.strength < 0.3

    def test_fixture_bounds(self, spark, sf_dir):
        (r,) = QUERIES["q_seasonality_strength"](spark, sf_dir).collect()
        assert r.n_days > 0
        assert 0.0 <= r.strength <= 1.0
        assert r.var_remainder <= r.var_total + 1e-9
