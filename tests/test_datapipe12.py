"""Planted-input tests for the wave-16 operators: the fanout audit
must keep zero-match keys, winsorized means must clip at exactly the
interpolated-then-quantized bounds, cohort LTV must accumulate per
cohort age, ABC must classify an exact-boundary part as B (not C),
and new-vs-returning must split a customer's later months correctly.
"""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_orders(tmp_path, rows):
    """rows = (o_orderkey, custkey, status, totalprice, (y,m,d))."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array(
                [float(r[3]) for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [dt.datetime(*r[4]) for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_lineitem(tmp_path, rows):
    """rows = (l_orderkey, l_partkey, extendedprice)."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), pa.int32()),
            "l_extendedprice": pa.array(
                [float(r[2]) for r in rows], pa.float64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _srnd(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


class TestJoinFanoutAudit:
    def test_zero_match_keys_kept(self, spark, tmp_path):
        """Order 1 has 3 items, order 2 has 1, order 3 has none —
        the zero bucket must appear with its own key count."""
        _write_orders(
            tmp_path,
            [
                (1, 1, "O", 1.0, (2024, 1, 1)),
                (2, 1, "O", 1.0, (2024, 1, 1)),
                (3, 1, "O", 1.0, (2024, 1, 1)),
            ],
        )
        sf = _write_lineitem(
            tmp_path, [(1, 10, 1.0), (1, 11, 1.0), (1, 12, 1.0), (2, 10, 1.0)]
        )
        out = {
            r["fanout"]: r
            for r in QUERIES["q_join_fanout_audit"](spark, sf).collect()
        }
        assert set(out) == {0, 1, 3}
        for f in (0, 1, 3):
            assert out[f]["n_keys"] == 1
            assert out[f]["pct_keys"] == _srnd(1 / 3, 6)


class TestWinsorize:
    def test_clips_at_quantized_bounds(self, spark, tmp_path):
        """20 values: 1.00..19.00 plus a 100.00 whale. p05 interpolates
        to 195c, p95 to 2305c; exactly one row clips per tail and the
        winsorized mean shifts from 1450c to 1070c."""
        rows = [
            (k, 1, "O", float(k), (2024, 1, 1)) for k in range(1, 20)
        ] + [(20, 1, "O", 100.0, (2024, 1, 1))]
        sf = _write_orders(tmp_path, rows)
        out = QUERIES["q_winsorize"](spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["q05c"], r["q95c"]) == (195, 2305)
        assert (r["n_clipped_lo"], r["n_clipped_hi"]) == (1, 1)
        assert r["mean_raw_cents"] == 1450.0
        # sum_wins = 29000 - 100 - 10000 + 195 + 2305 = 21400
        assert r["mean_wins_cents"] == 1070.0


class TestCohortLtv:
    def test_accumulates_per_cohort_age(self, spark, tmp_path):
        """Customer 1 (cohort 2024-01): $1 in Jan, $2 in Feb →
        ages 0/1 with cum 100/300. Customer 2 (cohort 2024-02): $5
        in Feb → its OWN cohort's age 0, not customer 1's age 1."""
        sf = _write_orders(
            tmp_path,
            [
                (1, 1, "O", 1.0, (2024, 1, 10)),
                (2, 1, "O", 2.0, (2024, 2, 5)),
                (3, 2, "O", 5.0, (2024, 2, 20)),
            ],
        )
        out = {
            (r["cohort_month"], r["age_months"]): r
            for r in QUERIES["q_cohort_ltv"](spark, sf).collect()
        }
        assert set(out) == {("2024-01", 0), ("2024-01", 1), ("2024-02", 0)}
        a = out[("2024-01", 0)]
        assert (a["cohort_size"], a["rev_cents"], a["cum_rev_cents"]) == (
            1, 100, 100,
        )
        b = out[("2024-01", 1)]
        assert (b["rev_cents"], b["cum_rev_cents"]) == (200, 300)
        assert b["avg_ltv_cents"] == 300.0
        c = out[("2024-02", 0)]
        assert (c["cohort_size"], c["cum_rev_cents"]) == (1, 500)


class TestAbcClassification:
    def test_exact_boundary_is_inclusive(self, spark, tmp_path):
        """Revenues 80/15/5: part 2's cumulative share is exactly 95%
        — the ≤ boundary must classify it B, and part 1 (80%) A."""
        sf = _write_lineitem(
            tmp_path, [(1, 1, 80.0), (2, 2, 15.0), (3, 3, 5.0)]
        )
        out = {
            r["abc_class"]: r
            for r in QUERIES["q_abc_classification"](spark, sf).collect()
        }
        assert set(out) == {"A", "B", "C"}
        assert (out["A"]["n_parts"], out["A"]["class_cents"]) == (1, 8000)
        assert (out["B"]["n_parts"], out["B"]["class_cents"]) == (1, 1500)
        assert (out["C"]["n_parts"], out["C"]["class_cents"]) == (1, 500)
        assert out["A"]["rev_share"] == 0.8
        assert out["B"]["rev_share"] == 0.15


class TestNewVsReturning:
    def test_split_by_acquisition_month(self, spark, tmp_path):
        """Customer 1: two Jan orders (both new — whole acquisition
        month counts) + one Feb order (returning). Customer 2 first
        appears in Feb (new)."""
        sf = _write_orders(
            tmp_path,
            [
                (1, 1, "O", 1.0, (2024, 1, 5)),
                (2, 1, "O", 2.0, (2024, 1, 25)),
                (3, 1, "O", 4.0, (2024, 2, 10)),
                (4, 2, "O", 8.0, (2024, 2, 15)),
            ],
        )
        out = {
            r["month"]: r
            for r in QUERIES["q_new_vs_returning"](spark, sf).collect()
        }
        jan, feb = out["2024-01"], out["2024-02"]
        assert (jan["n_new"], jan["n_returning"]) == (2, 0)
        assert jan["rev_new_cents"] == 300
        assert jan["new_share"] == 1.0
        assert (feb["n_new"], feb["n_returning"]) == (1, 1)
        assert (feb["rev_new_cents"], feb["rev_ret_cents"]) == (800, 400)
        assert feb["new_share"] == 0.5
