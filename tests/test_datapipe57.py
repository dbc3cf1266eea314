"""Planted gates for wave 60: PACF (C212), burstiness (C213),
repeat-purchase latency (C214)."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def _write_orders(tmp_path, rows):
    """rows = [(orderkey, custkey, totalprice, date)]"""
    n = len(rows)
    tbl = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["F"] * n, pa.string()),
        "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_customer(tmp_path, rows):
    n = len(rows)
    tbl = pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
        "c_nationkey": pa.array([0] * n, pa.int32()),
        "c_acctbal": pa.array([0.0] * n, pa.float64()),
        "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, type, ts)]"""
    n = len(rows)
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestPacf:
    def test_lag1_pacf_equals_acf(self, spark, sf_dir):
        rows = {r.lag_days: r for r in QUERIES["q_pacf"](spark, sf_dir).collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1].pacf == rows[1].acf_r

    def test_phi22_replicates_from_quantized_r(self, spark, sf_dir):
        rows = {r.lag_days: r for r in QUERIES["q_pacf"](spark, sf_dir).collect()}
        # r's enter the chain srnd8-quantized; outputs srnd6 — the
        # srnd6 of the acf column is the visible projection of the
        # same quantized value, so reconstruct φ22 from srnd6 r's
        # only to tolerance
        r1, r2 = rows[1].acf_r, rows[2].acf_r
        exp = (r2 - r1 * r1) / (1 - r1 * r1)
        assert abs(rows[2].pacf - exp) < 1e-4

    def test_ar1_like_series_kills_lag2(self, spark, tmp_path):
        """Deterministic AR(1): x_t = 600 + 0.6·x_{t-1} + md5 noise.
        Lag-2 ACF stays high (0.6² propagated) but PACF at lag 2
        collapses toward 0 — the direct-signal separation this
        operator exists for. (A pure linear trend is the degenerate
        r₁ = 1 case: the NULL guard fires instead.)"""
        import hashlib

        t0 = dt.datetime(2024, 1, 1)
        xs = [1000.0]
        for i in range(1, 40):
            noise = (
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 200
            ) - 100
            xs.append(600 + 0.6 * xs[-1] + noise)
        rows = [
            (i, 1, xs[i], t0 + dt.timedelta(days=i)) for i in range(40)
        ]
        sf = _write_orders(tmp_path, rows)
        out = {r.lag_days: r for r in QUERIES["q_pacf"](spark, sf).collect()}
        assert out[1].acf_r > 0.6
        assert out[2].acf_r > 0.4
        assert abs(out[2].pacf) < 0.25
        assert abs(out[2].pacf) < out[2].acf_r


class TestBurstiness:
    def test_constant_gaps_give_minus_one(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, 1, "tick", t0 + dt.timedelta(hours=i)) for i in range(10)
        ]
        sf = _write_events(tmp_path, rows)
        r = QUERIES["q_burstiness"](spark, sf).collect()[0]
        assert r.n_gaps == 9
        assert r.mean_gap_s == 3600.0
        assert r.burstiness == -1.0  # sigma = 0

    def test_hand_math_three_gaps(self, spark, tmp_path):
        """Gaps 100 s, 100 s, 400 s: mu = 200, sigma = sqrt(20000)."""
        t0 = dt.datetime(2024, 1, 1)
        offs = [0, 100, 200, 600]
        rows = [
            (i, 1, "e", t0 + dt.timedelta(seconds=o))
            for i, o in enumerate(offs)
        ]
        sf = _write_events(tmp_path, rows)
        r = QUERIES["q_burstiness"](spark, sf).collect()[0]
        mu, sig = 200.0, math.sqrt(180000 / 3 - 200.0 * 200.0)
        assert r.n_gaps == 3
        assert r.burstiness == _srnd((sig - mu) / (sig + mu), 6)

    def test_gaps_never_cross_users(self, spark, tmp_path):
        """Two users each with one event: no gaps exist at all."""
        t0 = dt.datetime(2024, 1, 1)
        rows = [(0, 1, "e", t0), (1, 2, "e", t0 + dt.timedelta(days=1))]
        sf = _write_events(tmp_path, rows)
        assert QUERIES["q_burstiness"](spark, sf).collect() == []


class TestRepurchaseLatency:
    def test_hand_gap_set(self, spark, tmp_path):
        """One segment, customer gaps {2, 4, 4, 10}: median = 4
        (2*cum>=5 at 4), p90 = 10, mean = 5.0."""
        t0 = dt.datetime(2024, 1, 1)
        _write_customer(tmp_path, [(1, "SEG"), (2, "SEG")])
        rows = [
            (0, 1, 10.0, t0),
            (1, 1, 10.0, t0 + dt.timedelta(days=2)),
            (2, 1, 10.0, t0 + dt.timedelta(days=6)),
            (3, 2, 10.0, t0),
            (4, 2, 10.0, t0 + dt.timedelta(days=4)),
            (5, 2, 10.0, t0 + dt.timedelta(days=14)),
        ]
        sf = _write_orders(tmp_path, rows)
        r = QUERIES["q_repurchase_latency"](spark, sf).collect()[0]
        assert r.n_gaps == 4
        assert r.median_days == 4
        assert r.p90_days == 10
        assert r.mean_days == 5.0

    def test_single_order_customers_contribute_nothing(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        _write_customer(tmp_path, [(1, "A"), (2, "B")])
        rows = [(0, 1, 10.0, t0), (1, 2, 10.0, t0)]
        sf = _write_orders(tmp_path, rows)
        assert QUERIES["q_repurchase_latency"](spark, sf).collect() == []

    def test_fixture_p90_dominates_median(self, spark, sf_dir):
        rows = QUERIES["q_repurchase_latency"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.p90_days >= r.median_days >= 0
            assert r.n_gaps > 0
