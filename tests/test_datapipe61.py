"""Planted gates for wave 64: sortedness audit (A33), effective
dimension (C227), log-rank test (C228)."""

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


def _write_docs(tmp_path, rows):
    """rows = [(doc_id, n_chars)]"""
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["t"] * len(rows), pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_embeddings(tmp_path, rows):
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _write_orders_custs(tmp_path, orders, custs):
    """orders = [(orderkey, custkey, date)]; custs = [(custkey, seg)]"""
    n = len(orders)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
        "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
        "o_orderstatus": pa.array(["F"] * n, pa.string()),
        "o_totalprice": pa.array([10.0] * n, pa.float64()),
        "o_orderdate": pa.array([r[2] for r in orders], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    }), str(tmp_path / "orders.parquet"))
    m = len(custs)
    pq.write_table(pa.table({
        "c_custkey": pa.array([r[0] for r in custs], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in custs], pa.string()),
        "c_nationkey": pa.array([0] * m, pa.int32()),
        "c_acctbal": pa.array([0.0] * m, pa.float64()),
        "c_mktsegment": pa.array([r[1] for r in custs], pa.string()),
    }), str(tmp_path / "customer.parquet"))
    return str(tmp_path)


class TestSortednessAudit:
    def test_sorted_layout_is_perfect(self, spark, tmp_path):
        sf = _write_docs(tmp_path, [(i, i * 2) for i in range(100)])
        r = QUERIES["q_sortedness_audit"](spark, sf).collect()[0]
        assert r.n_files == 2
        assert r.n_pairs == 98  # 49 per file
        assert r.n_inorder == 98
        assert r.sorted_fraction == 1.0
        assert r.n_sorted_files == 2

    def test_reverse_sorted_has_zero(self, spark, tmp_path):
        sf = _write_docs(tmp_path, [(i, 1000 - i) for i in range(100)])
        r = QUERIES["q_sortedness_audit"](spark, sf).collect()[0]
        assert r.n_inorder == 0
        assert r.sorted_fraction == 0.0
        assert r.n_sorted_files == 0

    def test_fixture_near_random_baseline(self, spark, sf_dir):
        r = QUERIES["q_sortedness_audit"](spark, sf_dir).collect()[0]
        # synthetic n_chars are unordered w.r.t. doc_id: ~0.5 with
        # slack for ties (>= counts as in-order)
        assert 0.3 <= r.sorted_fraction <= 0.75
        assert r.n_files > 0


class TestEffectiveDim:
    def test_isotropic_dims_use_all(self, spark, tmp_path):
        """4 dims, each with the same variance pattern -> ED ≈ 4."""
        rows = []
        for i in range(8):
            v = 1.0 if i % 2 == 0 else -1.0
            rows.append((i, [v, v, v, v], 0))
        sf = _write_embeddings(tmp_path, rows)
        r = QUERIES["q_effective_dim"](spark, sf).collect()[0]
        assert r.n_dims == 4
        assert abs(r.effective_dim - 4.0) < 1e-6
        assert r.top_dim_share == 0.25

    def test_single_live_dim(self, spark, tmp_path):
        """Only dim 1 varies -> ED = 1, top share = 1."""
        rows = [(i, [float(i % 2), 0.5, 0.5], 0) for i in range(8)]
        sf = _write_embeddings(tmp_path, rows)
        r = QUERIES["q_effective_dim"](spark, sf).collect()[0]
        assert r.n_dims == 3
        assert abs(r.effective_dim - 1.0) < 1e-6
        assert r.top_dim_share == 1.0

    def test_fixture_bounds(self, spark, sf_dir):
        r = QUERIES["q_effective_dim"](spark, sf_dir).collect()[0]
        assert r.n_dims == 64
        assert 1.0 <= r.effective_dim <= 64.0 + 1e-9
        assert 0.0 < r.top_dim_share <= 1.0


class TestLogrank:
    def test_identical_clocks_near_zero(self, spark, tmp_path):
        """Both segments reorder on the same two-point clock (half
        at day 5, half at day 10): O1 == E1 pointwise with positive
        hypergeometric variance -> z = 0. (A SINGLE shared event
        time would make V = 0 via the (n-d)/(n-1) factor and z NULL
        — the degenerate-guard path.)"""
        t0 = dt.datetime(1995, 1, 1)
        orders, custs = [], []
        for k in range(8):
            seg = "BUILDING" if k < 4 else "OTHER"
            days = 5 if k % 2 == 0 else 10
            custs.append((k, seg))
            orders.append((2 * k, k, t0))
            orders.append((2 * k + 1, k, t0 + dt.timedelta(days=days)))
        sf = _write_orders_custs(tmp_path, orders, custs)
        r = QUERIES["q_logrank"](spark, sf).collect()[0]
        assert (r.n1, r.n2) == (4, 4)
        assert r.o1 == 4
        assert abs(r.e1 - 4.0) < 1e-6
        assert r.z == 0.0

    def test_single_event_time_degenerates_to_null(self, spark, tmp_path):
        t0 = dt.datetime(1995, 1, 1)
        t5 = t0 + dt.timedelta(days=5)
        orders, custs = [], []
        for k in range(8):
            seg = "BUILDING" if k < 4 else "OTHER"
            custs.append((k, seg))
            orders.append((2 * k, k, t0))
            orders.append((2 * k + 1, k, t5))
        sf = _write_orders_custs(tmp_path, orders, custs)
        r = QUERIES["q_logrank"](spark, sf).collect()[0]
        assert r.o1 == 4 and abs(r.e1 - 4.0) < 1e-6
        assert r.z is None  # V = 0: everyone shares one event time

    def test_fast_group_signed_positive(self, spark, tmp_path):
        """BUILDING reorders day 2, OTHER day 20: group-1 events come
        while everyone is still at risk -> O1 > E1 -> z > 0."""
        t0 = dt.datetime(1995, 1, 1)
        orders, custs = [], []
        for k in range(6):
            custs.append((k, "BUILDING"))
            orders.append((2 * k, k, t0))
            orders.append((2 * k + 1, k, t0 + dt.timedelta(days=2)))
        for k in range(6, 12):
            custs.append((k, "OTHER"))
            orders.append((2 * k, k, t0))
            orders.append((2 * k + 1, k, t0 + dt.timedelta(days=20)))
        sf = _write_orders_custs(tmp_path, orders, custs)
        r = QUERIES["q_logrank"](spark, sf).collect()[0]
        assert r.o1 == 6
        assert r.e1 < 6.0
        assert r.z > 0

    def test_fixture_accounting(self, spark, sf_dir, duck):
        r = QUERIES["q_logrank"](spark, sf_dir).collect()[0]
        (n1,) = duck.execute(
            "SELECT count(DISTINCT o_custkey) FROM orders o"
            " JOIN customer c ON c.c_custkey = o.o_custkey"
            " WHERE c.c_mktsegment = 'BUILDING'"
        ).fetchone()
        assert r.n1 == n1
        assert 0 <= r.o1 <= r.n1
        # E1 is a probability-weighted share of pooled events
        assert 0.0 <= r.e1
