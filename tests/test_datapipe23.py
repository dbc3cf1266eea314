"""Planted-input tests for wave 27 (C142): identical period
distributions give PSI exactly 0 (smoothing applied symmetrically),
a hand-computed shifted distribution, the one-side-empty-bin
smoothing guard, and the top-bin cap.
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
    """rows = [(orderkey, totalprice, year)]."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array(
                [float(r[1]) for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [dt.datetime(r[2], 6, 15) for r in rows],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(rows), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _py_psi(ca, cb):
    """ca/cb: dict bin -> count; replicate the smoothed pipeline."""
    na, nb = sum(ca.values()), sum(cb.values())
    bins = sorted(set(ca) | set(cb))
    terms = {}
    for b in bins:
        a = ca.get(b, 0) + 0.5
        d = cb.get(b, 0) + 0.5
        pa_ = a / (na + 5.0)
        pb_ = d / (nb + 5.0)
        terms[b] = _srnd(
            (pa_ - pb_) * math.log((a * (nb + 5.0)) / (d * (na + 5.0))), 8
        )
    return terms, _srnd(sum(terms.values()), 6)


class TestPsi:
    def test_identical_zero_shift_and_empty_bin(self, spark, tmp_path):
        """Identical per-bin counts in both years -> every term and
        the total are exactly 0. A shifted year (mass moved up two
        bins, one bin empty on one side, one value past the top-bin
        cap) matches the Python replication."""
        rows, key = [], 0
        for yr in (1996, 1997):
            for price, cnt in ((10_000, 8), (60_000, 4), (120_000, 2)):
                for _ in range(cnt):
                    key += 1
                    rows.append((key, price, yr))
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_psi"](spark, sf).collect()
        assert len(out) == 3
        for r in out:
            assert r["term"] == 0.0 and r["psi_total"] == 0.0, r

        d2 = tmp_path / "shift"
        d2.mkdir()
        rows2, key = [], 0
        a_counts = {0: 8, 1: 4, 2: 2}  # 1996: bins 0,1,2
        b_counts = {1: 6, 2: 4, 9: 4}  # 1997: shifted + capped top bin
        for yr, counts in ((1996, a_counts), (1997, b_counts)):
            for b, cnt in counts.items():
                price = 999_000 if b == 9 else b * 50_000 + 10_000
                for _ in range(cnt):
                    key += 1
                    rows2.append((key, price, yr))
        sf2 = _write_orders(d2, rows2)
        out2 = {
            r["bin"]: r for r in QUERIES["q_psi"](spark, sf2).collect()
        }
        exp_terms, exp_total = _py_psi(a_counts, b_counts)
        assert set(out2) == set(exp_terms)
        for b, t in exp_terms.items():
            assert out2[b]["term"] == t, b
            assert out2[b]["psi_total"] == exp_total
        assert out2[9]["ca"] == 0 and out2[9]["cb"] == 4  # empty side
        assert exp_total > 0.25  # a shift this size screams "retrain"
