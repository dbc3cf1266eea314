"""Planted gates for wave 54: q_gumbel_return_level (C194) and
q_dispersion_index (C195)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_events(tmp_path, rows):
    """rows = [(event_id, day, event_type, value)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, r[1], 12) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# ---------------------------------------- C194 Gumbel return levels


class TestGumbelReturnLevel:
    def test_python_replication(self, spark, tmp_path):
        # one event per day: daily max IS the value
        maxima = [100.0 + 7 * i % 40 for i in range(20)]
        rows = [(i, i + 1, "view", v) for i, v in enumerate(maxima)]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_gumbel_return_level"](spark, sf).collect()
        q8 = lambda x: math.floor(x * 1e8 + 0.5) / 1e8  # noqa: E731
        cents = [round(v * 100) for v in maxima]
        n = len(cents)
        m = q8(sum(cents) / (100.0 * n))
        var = (
            (sum(c * c for c in cents) / n - (sum(cents) / n) ** 2)
            / 10000.0
            * n
            / (n - 1)
        )
        beta = q8(math.sqrt(var) * 0.7796968)
        mu = q8(m - 0.5772157 * beta)
        assert r.n_days == n
        assert r.gumbel_mu == pytest.approx(mu, abs=1e-5)
        assert r.gumbel_beta == pytest.approx(beta, abs=1e-5)
        assert r.rl_365d == pytest.approx(mu + beta * 5.8981239, abs=1e-4)

    def test_return_levels_monotone(self, spark, sf_dir):
        (r,) = QUERIES["q_gumbel_return_level"](spark, sf_dir).collect()
        assert r.gumbel_beta >= 0
        assert r.rl_30d <= r.rl_90d <= r.rl_365d
        assert r.rl_30d > r.gumbel_mu  # T=30 is beyond the mode

    def test_constant_maxima_collapse(self, spark, tmp_path):
        rows = [(i, i + 1, "view", 50.0) for i in range(10)]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_gumbel_return_level"](spark, sf).collect()
        assert r.gumbel_beta == pytest.approx(0.0, abs=1e-9)
        assert r.rl_365d == pytest.approx(50.0, abs=1e-6)


# ------------------------------------------ C195 dispersion index


class TestDispersionIndex:
    def test_constant_daily_counts_underdispersed(self, spark, tmp_path):
        # exactly 4 events per day for 10 days: variance 0
        rows = [
            (i, 1 + i // 4, "view", 1.0) for i in range(40)
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_dispersion_index"](spark, sf).collect()
        assert r.n_days == 10 and r.mean_c == pytest.approx(4.0)
        assert r.dispersion == pytest.approx(0.0, abs=1e-9)
        assert r.overdispersed == 0

    def test_bursty_counts_flag(self, spark, tmp_path):
        # 9 days of 1 event + one day of 50: wildly overdispersed
        rows = [(i, i + 1, "view", 1.0) for i in range(9)]
        rows += [(100 + j, 10, "view", 1.0) for j in range(50)]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_dispersion_index"](spark, sf).collect()
        assert r.overdispersed == 1
        assert r.dispersion > 10

    def test_python_replication_on_fixture(self, spark, sf_dir, duck):
        rows = QUERIES["q_dispersion_index"](spark, sf_dir).collect()
        truth = {}
        for et, d, c in duck.execute(
            "SELECT event_type, day(ts), count(*) FROM events GROUP BY 1, 2"
        ).fetchall():
            truth.setdefault(et, []).append(c)
        for r in rows:
            cs = truth[r.event_type]
            n = len(cs)
            mean = sum(cs) / n
            var = (sum(c * c for c in cs) / n - mean * mean) * n / (n - 1)
            assert r.n_days == n
            assert r.dispersion == pytest.approx(var / mean, abs=1e-4)
            assert r.overdispersed == (1 if r.dispersion > 1.5 else 0)
