"""Planted gates for wave 62: Cochran's Q (C218), propensity overlap
(C219), runs test (C220), centroid silhouette (C221)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _srnd(x, n=6):
    return math.floor(x * 10**n + 0.5) / 10**n


def _write_orders(tmp_path, rows):
    """rows = [(orderkey, status, totalprice, date)]"""
    n = len(rows)
    tbl = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
        "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, user_ids):
    t0 = dt.datetime(2024, 1, 1)
    n = len(user_ids)
    tbl = pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array([t0] * n, pa.timestamp("us")),
        "user_id": pa.array(user_ids, pa.int64()),
        "event_type": pa.array(["e"] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_embeddings(tmp_path, rows):
    """rows = [(vec_id, [floats], label)]"""
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


class TestCochranQ:
    @staticmethod
    def _replicate(rows):
        n = ga = gb = gc = sr2 = 0
        for k, st in rows:
            y = 1 if st == "F" else 0
            hh = hashlib.md5(str(k).encode()).hexdigest()
            a = 1 if int(hh[:8], 16) % 1000 + 300 * y >= 650 else 0
            b = 1 if int(hh[8:16], 16) % 1000 + 200 * y >= 650 else 0
            c = 1 if int(hh[16:24], 16) % 1000 + 250 * y >= 650 else 0
            ca, cb, cc = int(a == y), int(b == y), int(c == y)
            n += 1
            ga += ca
            gb += cb
            gc += cc
            sr2 += (ca + cb + cc) ** 2
        den = 3 * (ga + gb + gc) - sr2
        q = (
            None
            if den == 0
            else _srnd(
                2 * (3 * (ga**2 + gb**2 + gc**2) - (ga + gb + gc) ** 2)
                / den,
                6,
            )
        )
        return n, ga, gb, gc, q

    def test_python_replication(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        rows = [(k, "F" if k % 3 == 0 else "O") for k in range(1, 81)]
        sf = _write_orders(tmp_path, [(k, s, 10.0, t0) for k, s in rows])
        r = QUERIES["q_cochran_q"](spark, sf).collect()[0]
        n, ga, gb, gc, q = self._replicate(rows)
        assert (r.n, r.g_a, r.g_b, r.g_c) == (n, ga, gb, gc)
        assert r.q_stat == q

    def test_fixture_planted_quality_ordering(self, spark, sf_dir):
        r = QUERIES["q_cochran_q"](spark, sf_dir).collect()[0]
        # stronger label shift -> more correct answers: A(+300)
        # beats C(+250) beats B(+200)
        assert r.g_a >= r.g_c >= r.g_b
        assert r.q_stat is None or r.q_stat >= 0


class TestPropensityOverlap:
    def test_randomized_assignment_high_overlap(self, spark, sf_dir):
        r = QUERIES["q_propensity_overlap"](spark, sf_dir).collect()[0]
        # assignment and score are independent hashes -> overlap high
        assert r.overlap > 0.7
        assert 0 <= r.n_violations <= r.n_cells

    def test_overlap_bounds_and_mass(self, spark, tmp_path):
        sf = _write_events(tmp_path, list(range(200)))
        r = QUERIES["q_propensity_overlap"](spark, sf).collect()[0]
        assert r.nt + r.nc == 200
        assert 0.0 <= r.overlap <= 1.0
        # replicate exactly: assignment hashes the user, the score
        # cell hashes the event — event_id == user_id == u here
        cells = {}
        for u in range(200):
            hh = hashlib.md5(str(u).encode()).hexdigest()
            t = int(hh[:8], 16) % 2
            cell = int(hh[8:16], 16) % 100
            a, b = cells.get(cell, (0, 0))
            cells[cell] = (a + t, b + (1 - t))
        nt = sum(a for a, _ in cells.values())
        nc = sum(b for _, b in cells.values())
        num = sum(min(a * nc, b * nt) for a, b in cells.values())
        assert r.overlap == _srnd(num / (nt * nc), 6)
        assert r.n_violations == sum(
            1 for a, b in cells.values() if a == 0 or b == 0
        )


class TestRunsTest:
    def test_alternating_signs_max_runs(self, spark, tmp_path):
        """Daily revenue alternates 100/300 around median 300 — the
        100-days are below, the 300-days EQUAL the median and are
        excluded... use 3 levels to pin: values 100, 300 alternating
        with odd count makes median 300; excluded days leave only
        below-median days -> 1 run, z undefined-ish. Use a clean
        2-level series with even median exclusion instead: values
        alternate 100/500 (median 300 from cells {100, 500}: n=20,
        (n+1)/2=10.5 -> 2*c>=21 at 500? cum(100)=10 -> 20>=21 false;
        cum(500)=20 -> min rev with 40>=21 is 500). So median = 500,
        the 500-days are excluded, leaving 10 below-median days ->
        n1=0. Simplify: use 3 distinct values."""
        t0 = dt.datetime(2024, 1, 1)
        # values: low, high, low, high ... with one middle day as the
        # median anchor: [100, 900]*10 + [500] -> median 500 excluded,
        # signs alternate perfectly -> runs = 20, z > 0
        rows = []
        for i in range(20):
            rows.append((i, "F", 100.0 if i % 2 == 0 else 900.0,
                         t0 + dt.timedelta(days=i)))
        rows.append((20, "F", 500.0, t0 + dt.timedelta(days=20)))
        sf = _write_orders(tmp_path, rows)
        r = QUERIES["q_runs_test"](spark, sf).collect()[0]
        assert (r.n1, r.n2) == (10, 10)
        assert r.r == 20
        assert r.z > 0

    def test_two_blocks_minimal_runs(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        rows = [(i, "F", 100.0, t0 + dt.timedelta(days=i)) for i in range(10)]
        rows += [(10 + i, "F", 900.0, t0 + dt.timedelta(days=10 + i))
                 for i in range(10)]
        rows.append((20, "F", 500.0, t0 + dt.timedelta(days=20)))
        sf = _write_orders(tmp_path, rows)
        r = QUERIES["q_runs_test"](spark, sf).collect()[0]
        assert r.r == 2
        assert r.z < 0

    def test_fixture_totals_consistent(self, spark, sf_dir, duck):
        r = QUERIES["q_runs_test"](spark, sf_dir).collect()[0]
        (days,) = duck.execute(
            "SELECT count(DISTINCT strftime(o_orderdate, '%Y-%m-%d'))"
            " FROM orders"
        ).fetchone()
        assert r.n1 + r.n2 <= days
        assert 1 <= r.r <= r.n1 + r.n2


class TestSilhouette:
    def test_two_tight_clusters_near_one(self, spark, tmp_path):
        rows = []
        for i in range(5):
            rows.append((i, [1.0 + 0.001 * i, 0.0], 0))
            rows.append((10 + i, [0.0, 1.0 + 0.001 * i], 1))
        sf = _write_embeddings(tmp_path, rows)
        out = {r.label: r for r in QUERIES["q_silhouette"](spark, sf).collect()}
        assert set(out) == {0, 1}
        for r in out.values():
            assert r.n_vecs == 5
            assert r.mean_silhouette > 0.95

    def test_identical_centroids_zeroish(self, spark, tmp_path):
        """Both labels draw from the SAME tight blob: a ≈ b -> s ≈ 0."""
        rows = []
        for i in range(6):
            rows.append((i, [1.0 + 0.001 * (i % 3), 2.0], i % 2))
        sf = _write_embeddings(tmp_path, rows)
        out = QUERIES["q_silhouette"](spark, sf).collect()
        for r in out:
            assert abs(r.mean_silhouette) < 0.6

    def test_hand_geometry(self, spark, tmp_path):
        """Labels {0: [(0,0)], 1: [(3,0)], 2: [(0,4)]}: singleton
        clusters sit ON their centroids -> a = 0, b = nearest other
        centroid -> s = 1 for every vector."""
        rows = [(0, [0.0, 0.0], 0), (1, [3.0, 0.0], 1), (2, [0.0, 4.0], 2)]
        sf = _write_embeddings(tmp_path, rows)
        out = QUERIES["q_silhouette"](spark, sf).collect()
        assert len(out) == 3
        for r in out:
            assert r.mean_silhouette == 1.0
