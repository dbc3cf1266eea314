"""Planted-input tests for wave 19: a perfectly 7-periodic daily
series must autocorrelate to exactly 1.0 at lag 7, and every lag must
match a pure-Python Pearson over the same sufficient statistics.
"""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_orders(tmp_path, day_revs):
    """day_revs = [(datetime, dollars), ...] — one order per day."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array(
                range(1, len(day_revs) + 1), pa.int64()
            ),
            "o_custkey": pa.array([1] * len(day_revs), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(day_revs), pa.string()),
            "o_totalprice": pa.array(
                [float(r) for _, r in day_revs], pa.float64()
            ),
            "o_orderdate": pa.array(
                [d for d, _ in day_revs], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(day_revs), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def _ref_acf(revs: list[int], k: int) -> float:
    xs = revs[:-k]
    ys = revs[k:]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    # exact-int assembly then ONE float conversion per term — the
    # r11 engine semantics (DECIMAL/HUGEINT sufficient statistics)
    return float(n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    )


class TestAutocorrelation:
    def test_periodic_series_and_python_reference(self, spark, tmp_path):
        """35 consecutive days repeating the weekly pattern
        10..70: lag-7 pairs are identical (r = 1.0 exactly); lags 1
        and 30 must match the pure-Python Pearson."""
        pattern = [10, 20, 30, 40, 50, 60, 70]
        revs = (pattern * 5)[:35]
        start = dt.datetime(2024, 1, 1)
        day_revs = [
            (start + dt.timedelta(days=i), r) for i, r in enumerate(revs)
        ]
        sf = _write_orders(tmp_path, day_revs)
        out = {
            r["lag_days"]: r
            for r in QUERIES["q_autocorrelation"](spark, sf).collect()
        }
        assert set(out) == {1, 7, 30}
        assert out[7]["n_pairs"] == 28
        assert out[7]["acf_r"] == 1.0
        for k in (1, 30):
            assert out[k]["n_pairs"] == 35 - k
            assert out[k]["acf_r"] == _srnd(_ref_acf(revs, k), 6), k
