"""Planted-input tests for wave 29 (C145-C147):
a Kaplan-Meier fixture with hand-placed events and censorings whose
product-limit curve is computed by a Python replication (plus the
censoring-matters check: dropping censored customers changes the
curve), an exact-elasticity fixture (q = c·p^-2 recovered as
ε = −2), and an equal-share market whose HHI is exactly 1/k.
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
    """rows = [(orderkey, custkey, date)]."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
            "o_orderdate": pa.array(
                [r[2] for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(rows), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_lineitem_part(tmp_path, li_rows, parts):
    """li_rows = [(orderkey, partkey, qty, extprice, shipdate)]."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in li_rows], pa.int64()),
            "l_linenumber": pa.array(
                list(range(1, len(li_rows) + 1)), pa.int32()
            ),
            "l_quantity": pa.array(
                [float(r[2]) for r in li_rows], pa.float64()
            ),
            "l_extendedprice": pa.array(
                [float(r[3]) for r in li_rows], pa.float64()
            ),
            "l_returnflag": pa.array(["N"] * len(li_rows), pa.string()),
            "l_shipdate": pa.array(
                [r[4] for r in li_rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    ptbl = pa.table(
        {
            "p_partkey": pa.array([p[0] for p in parts], pa.int64()),
            "p_name": pa.array([f"p{p[0]}" for p in parts], pa.string()),
            "p_brand": pa.array([p[1] for p in parts], pa.string()),
        }
    )
    pq.write_table(ptbl, str(tmp_path / "part.parquet"))
    return str(tmp_path)


def _py_km(durs):
    """durs = [(dur, event)]; replicate the quantized product-limit."""
    from collections import Counter

    d_cnt = Counter(d for d, e in durs if e)
    out = {}
    cum = 0.0
    for t in sorted(d_cnt):
        n_risk = sum(1 for d, _ in durs if d >= t)
        d = d_cnt[t]
        if d == n_risk:  # ln(0): curve hits exactly 0 (engines: -inf)
            cum = float("-inf")
        else:
            cum += _srnd(math.log(1.0 - d / n_risk), 8)
        cum_q = (
            cum
            if cum == float("-inf")
            else math.floor(cum * 1e8 + 0.5) / 1e8
        )
        out[t] = (n_risk, d, _srnd(math.exp(cum_q), 6))
    return out


class TestKaplanMeier:
    def test_hand_curve_and_censoring_matters(self, spark, tmp_path):
        """10 customers: 6 reorder at known gaps (two ties), 4 are
        censored at known in-between offsets. The Spark curve must
        equal the Python product-limit exactly — and differ from the
        no-censoring curve (proof censoring is actually handled)."""
        day0 = dt.datetime(2024, 1, 1)
        end = day0 + dt.timedelta(days=100)  # censor anchor
        # (custkey, gap_to_second or None->censored-at, first_offset)
        spec = [
            (1, 10, 0), (2, 10, 0), (3, 30, 0), (4, 50, 0),
            (5, 70, 0), (6, 90, 0),
            (7, None, 0),    # censored at 100
            (8, None, 20),   # censored at 80
            (9, None, 60),   # censored at 40
            (10, None, 95),  # censored at 5
        ]
        rows, key = [], 0
        for ck, gap, off in spec:
            key += 1
            rows.append((key, ck, day0 + dt.timedelta(days=off)))
            if gap is not None:
                key += 1
                rows.append(
                    (key, ck, day0 + dt.timedelta(days=off + gap))
                )
        # pin the censor date with a throwaway customer ordering twice
        key += 1
        rows.append((key, 99, end))
        key += 1
        rows.append((key, 99, end))
        sf = _write_orders(tmp_path, rows)
        out = {
            r["t"]: (r["n_risk"], r["d"], r["s_hat"])
            for r in QUERIES["q_kaplan_meier"](spark, sf).collect()
        }
        durs = []
        for ck, gap, off in spec:
            if gap is not None:
                durs.append((gap, 1))
            else:
                durs.append((100 - off, 0))
        # customer 99 (the censor-date pin) orders twice the SAME day:
        # no strictly-later second order, so they are censored at 0
        durs.append((0, 0))
        exp = _py_km(durs)
        assert out == exp
        # censoring must matter: the naive (drop-censored) curve at
        # t=90 differs from the censoring-correct one
        naive = _py_km([(d, e) for d, e in durs if e])
        assert out[90][2] != naive[90][2]


class TestElasticity:
    def test_exact_power_law(self, spark, tmp_path):
        """Brand X: q = 1e6 / p^2 exactly over prices 1..60 (plus a
        filler brand below the n>=50 floor): elasticity = -2.0."""
        t = dt.datetime(1996, 3, 1)
        li, parts = [], [(1, "X"), (2, "Y")]
        ok = 0
        for p_ in range(1, 61):
            q = 1e6 / (p_ * p_)
            ok += 1
            # extendedprice = unit price * quantity
            li.append((ok, 1, q, p_ * q, t))
        for _ in range(5):  # brand Y: too few observations
            ok += 1
            li.append((ok, 2, 10.0, 100.0, t))
        sf = _write_lineitem_part(tmp_path, li, parts)
        out = {
            r["brand"]: r
            for r in QUERIES["q_elasticity"](spark, sf).collect()
        }
        assert set(out) == {"X"}  # Y excluded by the n floor
        assert out["X"]["n"] == 60
        assert out["X"]["elasticity"] == -2.0


class TestHhi:
    def test_equal_shares_and_monopoly_shift(self, spark, tmp_path):
        """1996: 5 equal brands -> HHI exactly 0.2, effective_n 5.
        1997: one brand holds 80% -> HHI = 0.64 + 4*0.0025 = 0.65."""
        t96, t97 = dt.datetime(1996, 6, 1), dt.datetime(1997, 6, 1)
        parts = [(i, f"B{i}") for i in range(1, 6)]
        li, ok = [], 0
        for pk in range(1, 6):
            ok += 1
            li.append((ok, pk, 1.0, 200.0, t96))
        for pk, amt in ((1, 800.0), (2, 50.0), (3, 50.0), (4, 50.0),
                        (5, 50.0)):
            ok += 1
            li.append((ok, pk, 1.0, amt, t97))
        sf = _write_lineitem_part(tmp_path, li, parts)
        out = {r["yr"]: r for r in QUERIES["q_hhi"](spark, sf).collect()}
        assert out[1996]["n_brands"] == 5
        assert out[1996]["hhi"] == 0.2
        assert out[1996]["effective_n"] == 5.0
        assert out[1997]["hhi"] == _srnd(
            _srnd(0.8 * 0.8, 8) + 4 * _srnd(0.05 * 0.05, 8), 6
        )
