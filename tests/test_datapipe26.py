"""Planted-input tests for wave 30 (C148): identical prices in both
years give all three indexes exactly 1.0, a hand-computed two-part
basket, the both-years matching rule, and the time-reversal property
of the Fisher index (F(0→1) · F(1→0) = 1 to quantization).
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


def _write_lineitem(tmp_path, rows):
    """rows = [(orderkey, partkey, qty, extprice, year)]."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_linenumber": pa.array(
                list(range(1, len(rows) + 1)), pa.int32()
            ),
            "l_quantity": pa.array(
                [float(r[2]) for r in rows], pa.float64()
            ),
            "l_extendedprice": pa.array(
                [float(r[3]) for r in rows], pa.float64()
            ),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
            "l_shipdate": pa.array(
                [dt.datetime(r[4], 6, 1) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


class TestPriceIndex:
    def test_identity_hand_basket_and_matching(self, spark, tmp_path):
        """Same prices both years -> L = P = F = 1.0 exactly. A part
        traded only in one year must not enter the basket."""
        rows = [
            (1, 1, 10.0, 100.0, 1996), (2, 1, 20.0, 200.0, 1997),
            (3, 2, 5.0, 250.0, 1996), (4, 2, 8.0, 400.0, 1997),
            (5, 3, 9.0, 999.0, 1996),  # only in 1996: excluded
        ]
        sf = _write_lineitem(tmp_path, rows)
        out = QUERIES["q_price_index"](spark, sf).collect()[0]
        assert out["n_parts"] == 2
        assert out["laspeyres"] == 1.0
        assert out["paasche"] == 1.0
        assert out["fisher"] == 1.0

    def test_hand_computed_and_time_reversal(self, spark, tmp_path):
        """Part 1: $10 -> $12 (q 10 -> 6); part 2: $50 -> $45
        (q 2 -> 4). Verify L and P by hand and the Fisher
        time-reversal property against the reversed fixture."""
        rows = [
            (1, 1, 10.0, 100.0, 1996), (2, 1, 6.0, 72.0, 1997),
            (3, 2, 2.0, 100.0, 1996), (4, 2, 4.0, 180.0, 1997),
        ]
        sf = _write_lineitem(tmp_path, rows)
        out = QUERIES["q_price_index"](spark, sf).collect()[0]
        # p4 units: 1e-4 dollars
        p0 = {1: 100_000, 2: 500_000}
        p1 = {1: 120_000, 2: 450_000}
        q0 = {1: 10, 2: 2}
        q1 = {1: 6, 2: 4}
        L = sum(p1[k] * q0[k] for k in p0) / sum(
            p0[k] * q0[k] for k in p0
        )
        P = sum(p1[k] * q1[k] for k in p0) / sum(
            p0[k] * q1[k] for k in p0
        )
        assert out["laspeyres"] == _srnd(L, 6)
        assert out["paasche"] == _srnd(P, 6)
        assert out["fisher"] == _srnd(math.sqrt(L * P), 6)

        d2 = tmp_path / "rev"
        d2.mkdir()
        rows_rev = [
            (r[0], r[1], r[2], r[3], 1997 if r[4] == 1996 else 1996)
            for r in rows
        ]
        sf2 = _write_lineitem(d2, rows_rev)
        back = QUERIES["q_price_index"](spark, sf2).collect()[0]
        assert abs(out["fisher"] * back["fisher"] - 1.0) < 1e-5
