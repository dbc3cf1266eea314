"""Planted-input tests for wave 31 (C149): a brand with a planted
JOINTLY-impossible point (unremarkable on each axis — the exact case
per-column screens miss) flagged by the Mahalanobis screen and
verified against a full Python replication; a spherical cloud with no
outliers; and the singular-covariance NULL guard.
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


def _write(tmp_path, li_rows, parts):
    """li_rows = [(orderkey, partkey, qty, extprice)]."""
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
                [dt.datetime(1996, 1, 1)] * len(li_rows),
                pa.timestamp("us"),
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


def _py_maha(pts, thr=13.815510557964274):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    mx, my = sx / n, sy / n
    vx = (sxx - sx * sx / n) / (n - 1)
    vy = (syy - sy * sy / n) / (n - 1)
    cxy = (sxy - sx * sy / n) / (n - 1)
    det = vx * vy - cxy * cxy
    d2s = [
        ((x - mx) ** 2 * vy - 2 * (x - mx) * (y - my) * cxy
         + (y - my) ** 2 * vx) / det
        for x, y in pts
    ]
    return sum(1 for d in d2s if d > thr), _srnd(max(d2s), 6)


class TestMahalanobis:
    def test_joint_outlier_and_python_replication(self, spark, tmp_path):
        """Brand X: (qty, unit price) strongly anti-correlated (bulk
        is cheap); the planted point has a MIDDLING qty and MIDDLING
        price — inside both 1-D ranges, far off the joint ellipse.
        The screen must flag exactly what the Python replication
        flags (at least that one point)."""
        pts = []
        # anti-correlated cloud: qty q, unit price 120 - 2q (+/- 1)
        for i in range(60):
            q = 10 + (i % 41)
            noise = (-1, 0, 1)[i % 3]
            pts.append((q, 120 - 2 * q + noise))
        pts.append((45, 95))  # joint outlier: qty and price both mid
        li = [
            (k + 1, 1, q, q * up)  # extendedprice = qty * unit price
            for k, (q, up) in enumerate(pts)
        ]
        sf = _write(tmp_path, li, [(1, "X")])
        out = {
            r["brand"]: r
            for r in QUERIES["q_mahalanobis_outliers"](spark, sf).collect()
        }
        # exact-cents replication: y = floor(ext*100/qty + .5)
        pypts = [
            (q, math.floor(q * up * 100.0 / q + 0.5)) for q, up in pts
        ]
        n_out, max_d2 = _py_maha(pypts)
        assert out["X"]["n"] == 61
        assert out["X"]["n_outliers"] == n_out
        assert n_out >= 1  # the planted joint outlier is caught
        assert out["X"]["max_d2"] == max_d2
        # 1-D screens would NOT flag it: qty 45 and price 95 are both
        # strictly inside the cloud's marginal ranges
        qs = [q for q, _ in pts[:-1]]
        ups = [u for _, u in pts[:-1]]
        assert min(qs) < 45 < max(qs) and min(ups) < 95 < max(ups)

    def test_singular_covariance_guard(self, spark, tmp_path):
        """A brand whose points are perfectly collinear has a
        singular covariance: d2 is NULL, so nothing is flagged and
        max_d2 is NULL rather than an error."""
        li = [
            (k + 1, 1, float(q), float(q * 10))
            for k, q in enumerate([5, 10, 15, 20, 25] * 12)
        ]
        sf = _write(tmp_path, li, [(1, "Z")])
        out = QUERIES["q_mahalanobis_outliers"](spark, sf).collect()[0]
        # unit price constant 10 -> vy = 0 and cxy = 0 -> det = 0
        assert out["n_outliers"] == 0
        assert out["max_d2"] is None
