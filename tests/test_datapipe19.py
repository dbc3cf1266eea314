"""Planted-input tests for wave 23 (C133-C134): a perfectly
proportional segment whose delta-method SE is exactly zero plus a
Python replication over hand-built customers, and a planted touch
sequence whose U-shaped credits are known in closed form (with the
window exclusion and the 1-/2-touch degenerate splits).
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
    """rows = [(orderkey, custkey, totalprice)]."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array(
                [float(r[2]) for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [dt.datetime(2024, 1, 1)] * len(rows), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(rows), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_customer(tmp_path, rows):
    """rows = [(custkey, mktsegment)]."""
    tbl = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "c_nationkey": pa.array([0] * len(rows), pa.int32()),
            "c_acctbal": pa.array([0.0] * len(rows), pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))


def _write_events(tmp_path, rows):
    """rows = [(event_id, ts, user_id, event_type, value)]."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestDeltaMethodCi:
    def test_proportional_collapse_and_python_reference(
        self, spark, tmp_path
    ):
        """Segment A: every customer's revenue is exactly 50x their
        order count -> the linearized residuals vanish and se = 0.
        Segment B: hand-built (x, y) pairs must match a Python
        replication of the same fixed assembly."""
        _write_customer(
            tmp_path, [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"),
                       (6, "B")]
        )
        rows, key = [], 0
        # A: customers with 2, 4, 6 orders of exactly 50 each
        for ck, cnt in ((1, 2), (2, 4), (3, 6)):
            for _ in range(cnt):
                key += 1
                rows.append((key, ck, 50.0))
        # B: (x, y) = (100, 1), (300, 2), (900, 3)
        b_pairs = {4: (100, 1), 5: (300, 2), 6: (900, 3)}
        for ck, (x, y) in b_pairs.items():
            per = x / y
            for _ in range(y):
                key += 1
                rows.append((key, ck, per))
        sf = _write_orders(tmp_path, rows)
        out = {
            r["seg"]: r
            for r in QUERIES["q_delta_method_ci"](spark, sf).collect()
        }
        a = out["A"]
        assert a["n"] == 3 and a["ratio"] == 50.0
        assert a["se"] == 0.0
        assert a["ci_lo"] == 50.0 and a["ci_hi"] == 50.0
        assert a["mde_rel"] == 0.0

        xs = [float(x) for x, _ in b_pairs.values()]
        ys = [float(y) for _, y in b_pairs.values()]
        n = 3.0
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        r = sx / sy
        vx = (sxx - sx * sx / n) / (n - 1.0)
        vy = (syy - sy * sy / n) / (n - 1.0)
        cxy = (sxy - sx * sy / n) / (n - 1.0)
        ybar = sy / n
        se = math.sqrt((vx - 2.0 * r * cxy + r * r * vy)
                       / (ybar * ybar) / n)
        z975, z80 = 1.959963984540054, 0.8416212335729143
        b = out["B"]
        assert b["ratio"] == _srnd(r, 6)
        assert b["se"] == _srnd(se, 6)
        assert b["ci_lo"] == _srnd(r - z975 * se, 6)
        assert b["ci_hi"] == _srnd(r + z975 * se, 6)
        assert b["mde_rel"] == _srnd(
            (z975 + z80) * se * math.sqrt(2.0 * n) / math.sqrt(n) / r, 6
        )


class TestMultiTouchAttribution:
    def test_u_shape_window_and_degenerate_splits(self, spark, tmp_path):
        """User 1: touches click,view,signup,click then a $100
        purchase -> credits 40/10/10/40 (click 80 total). User 2: two
        views before a $50 purchase -> 25/25. User 3: one signup ->
        full $20. User 4: a click 8 days before its purchase is
        outside the 7-day window -> no credit at all."""
        t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

        def ts(**kw):
            return t0 + dt.timedelta(**kw)

        rows = [
            # user 1
            (1, ts(hours=-20), 1, "click", 0.0),
            (2, ts(hours=-15), 1, "view", 0.0),
            (3, ts(hours=-10), 1, "signup", 0.0),
            (4, ts(hours=-5), 1, "click", 0.0),
            (5, t0, 1, "purchase", 100.0),
            # user 2
            (6, ts(hours=-3), 2, "view", 0.0),
            (7, ts(hours=-2), 2, "view", 0.0),
            (8, t0, 2, "purchase", 50.0),
            # user 3
            (9, ts(hours=-1), 3, "signup", 0.0),
            (10, t0, 3, "purchase", 20.0),
            # user 4: touch outside the window
            (11, ts(days=-8), 4, "click", 0.0),
            (12, t0, 4, "purchase", 999.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = {
            r["event_type"]: r
            for r in QUERIES["q_multi_touch_attribution"](
                spark, sf
            ).collect()
        }
        assert out["click"]["n_credits"] == 2
        assert out["click"]["attr_value"] == 80.0
        assert out["view"]["n_credits"] == 3  # 1 middle + 2 halves
        assert out["view"]["attr_value"] == 10.0 + 25.0 + 25.0
        assert out["signup"]["n_credits"] == 2
        assert out["signup"]["attr_value"] == 10.0 + 20.0
        total = sum(r["attr_value"] for r in out.values())
        assert total == 100.0 + 50.0 + 20.0  # user 4 fully excluded
