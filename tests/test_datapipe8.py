"""Planted-input tests for the wave-9 operators: the seasonal screen
must flag against the CELL's own baseline (not a global one), lift
must hit hand-computed values through all three paths, and the
weighted sample must reproduce a pure-python A-res reference exactly.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_events(tmp_path, rows):
    """rows = (event_id, user_id, hour, minute, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, r[2], r[3], 0) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[4] for r in rows], pa.string()),
            "value": pa.array([float(r[5]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    """rows = (doc_id, text, lang, source, n_chars)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestSeasonalBaseline:
    def test_flags_against_cell_not_global(self, spark, tmp_path):
        """Hour 3's cell is tight around 10 with one 100 → exactly one
        outlier. Hour 14's cell is wild (spread values INCLUDING 100)
        → 100 is normal there. A global baseline would flag both."""
        rows = [(i, i, 3, i, "view", 10.0 + (i % 3)) for i in range(8)]
        rows.append((8, 8, 3, 9, "view", 100.0))  # the hour-3 anomaly
        rows += [
            (20 + i, 20 + i, 14, i, "view", v)
            for i, v in enumerate([5.0, 200.0, 100.0, 400.0, 30.0, 250.0])
        ]
        sf = _write_events(tmp_path, rows)
        out = {
            (r["event_type"], r["hod"]): (r["n_events"], r["n_outliers"])
            for r in QUERIES["q_seasonal_baseline"](spark, sf).collect()
        }
        assert out[("view", 3)] == (9, 1)
        assert out[("view", 14)][1] == 0


class TestCooccurrence:
    def test_hand_lift(self, spark, tmp_path):
        """u1{view,click}, u2{view,click}, u3{view}, u4{purchase}:
        (click,view) n_both=2, lift = 2·4/(2·3) = 4/3; duplicate
        events per user must not inflate the distinct sets."""
        sf = _write_events(
            tmp_path,
            [
                (0, 1, 1, 0, "view", 0.0),
                (1, 1, 1, 1, "view", 0.0),  # dup (user, type)
                (2, 1, 1, 2, "click", 0.0),
                (3, 2, 1, 3, "view", 0.0),
                (4, 2, 1, 4, "click", 0.0),
                (5, 3, 1, 5, "view", 0.0),
                (6, 4, 1, 6, "purchase", 0.0),
            ],
        )
        out = {
            (r["type_a"], r["type_b"]): (r["n_both"], r["lift"])
            for r in QUERIES["q_cooccurrence"](spark, sf).collect()
        }
        assert set(out) == {("click", "view")}
        n_both, lift = out[("click", "view")]
        assert n_both == 2
        assert abs(lift - 2 * 4 / (2 * 3)) < 1e-6


class TestWeightedSample:
    def test_matches_pure_python_a_res(self, spark, tmp_path):
        """60 docs with md5-spread weights: the Spark top-50 must equal
        a from-scratch python replication of the A-res priorities."""
        rows = [
            (i, f"doc {i}", "en", "s0", 50 + 37 * ((i * 7) % 23))
            for i in range(60)
        ]
        sf = _write_docs(tmp_path, rows)
        got = sorted(
            r["doc_id"]
            for r in QUERIES["q_weighted_sample"](spark, sf).collect()
        )

        def priority(doc_id, w):
            h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            u = (h + 1) / 4294967296.0
            p = math.log(u) / w
            return math.floor(p * 1e8 + 0.5) / 1e8

        ref = sorted(
            ((priority(i, w), -i) for i, _, _, _, w in rows), reverse=True
        )[:50]
        want = sorted(-negid for _, negid in ref)
        assert got == want
        assert len(got) == 50

    def test_heavier_docs_win_ties_in_expectation(self, spark, tmp_path):
        """A doc with overwhelming weight relative to the field must be
        sampled: u^(1/w) → 1 as w → ∞ while light docs stay spread."""
        rows = [(i, "t", "en", "s0", 10) for i in range(60)]
        rows.append((999, "t", "en", "s0", 10**9))
        sf = _write_docs(tmp_path, rows)
        got = {
            r["doc_id"]
            for r in QUERIES["q_weighted_sample"](spark, sf).collect()
        }
        assert 999 in got


class TestSqlUdf:
    def test_functions_inline_and_null_guard(self, spark, tmp_path):
        """Hand rows across all three bands; a zero quantity must flow
        through the nullif guard as NULL (sum skips it), not throw
        under ANSI mode."""
        tbl = pa.table(
            {
                "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                "l_quantity": pa.array([4.0, 2.0, 0.0, 5.0], pa.float64()),
                "l_extendedprice": pa.array(
                    [10.0, 9.0, 7.0, 20.0], pa.float64()
                ),
                "l_discount": pa.array([0.01, 0.05, 0.05, 0.10], pa.float64()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
        out = {
            r["band"]: (r["n_rows"], r["unit_cents_sum"])
            for r in QUERIES["q_sql_udf"](spark, str(tmp_path)).collect()
        }
        assert out == {
            "low": (1, 250),          # 10/4 = 2.50
            "mid": (2, 450),          # 9/2 = 4.50; 7/0 → NULL skipped
            "high": (1, 400),         # 20/5 = 4.00
        }


class TestOccManifestCommit:
    def test_exactly_one_writer_wins_and_rebase_succeeds(
        self, spark, tmp_path
    ):
        from cassowary_spark.queries.datapipe7 import (
            ManifestConflict,
            commit_manifest,
            current_occ_version,
        )
        import pytest as _pytest

        root = str(tmp_path / "tbl")
        import os

        os.makedirs(root)
        m1 = spark.createDataFrame([("f1.parquet",)], ["file_name"])
        m2a = spark.createDataFrame(
            [("f1.parquet",), ("f2.parquet",)], ["file_name"]
        )
        m2b = spark.createDataFrame(
            [("f1.parquet",), ("f3.parquet",)], ["file_name"]
        )
        commit_manifest(spark, root, m1, 1)
        # writer A wins version 2
        commit_manifest(spark, root, m2a, 2)
        # writer B raced and must conflict on 2 — winner's v2 intact
        with _pytest.raises(ManifestConflict):
            commit_manifest(spark, root, m2b, 2)
        v2 = {
            r["file_name"]
            for r in spark.read.parquet(
                os.path.join(root, "manifest_occ_v2")
            ).collect()
        }
        assert v2 == {"f1.parquet", "f2.parquet"}
        # B rebases onto v2 and commits v3
        assert current_occ_version(root) == 2
        m3 = spark.createDataFrame(
            [("f1.parquet",), ("f2.parquet",), ("f3.parquet",)],
            ["file_name"],
        )
        commit_manifest(spark, root, m3, current_occ_version(root) + 1)
        assert current_occ_version(root) == 3
        # no staging residue
        assert not [f for f in os.listdir(root) if f.startswith(".staging")]


def _write_orders9(tmp_path, rows):
    """rows = (o_orderkey, custkey, totalprice, (y,m,d))."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [dt.datetime(*r[3]) for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestRfmSegmentation:
    def test_jointly_monotone_customers_get_diagonal_segments(
        self, spark, tmp_path
    ):
        """10 customers where recency, frequency, AND monetary all
        improve together: quintiles agree pairwise → segments are
        exactly 111..555, two customers each."""
        rows = []
        key = 0
        for c in range(10):
            # customer c: c+1 orders, each $100*(c+1), last order later
            # with c (more recent = better)
            for j in range(c + 1):
                rows.append((key, c, 100.0 * (c + 1), (1998, 1, 1 + c)))
                key += 1
        sf = _write_orders9(tmp_path, rows)
        out = {
            r["segment"]: r["n_customers"]
            for r in QUERIES["q_rfm_segmentation"](spark, sf).collect()
        }
        assert out == {f"{q}{q}{q}": 2 for q in range(1, 6)}


class TestEventPaths:
    def test_shared_prefix_paths_only_and_truncation(self, spark, tmp_path):
        """Users 1 and 2 share view>click; user 3's unique path drops
        under HAVING >= 2; user 4's 7-event stream truncates to its
        first 5 events."""
        rows = [
            (0, 1, 1, 0, "view", 0.0),
            (1, 1, 1, 1, "click", 0.0),
            (2, 2, 1, 0, "view", 0.0),
            (3, 2, 1, 1, "click", 0.0),
            (4, 3, 1, 0, "error", 0.0),
        ]
        rows += [
            (5 + i, 4, 1, i, t, 0.0)
            for i, t in enumerate(
                ["view", "view", "view", "view", "view", "click", "click"]
            )
        ]
        rows += [
            (20 + i, 5, 1, i, t, 0.0)
            for i, t in enumerate(["view"] * 5)
        ]
        sf = _write_events(tmp_path, rows)
        out = {
            r["path"]: r["n_users"]
            for r in QUERIES["q_event_paths"](spark, sf).collect()
        }
        # users 4 and 5 both truncate/land on five views
        assert out == {"view>click": 2, "view>view>view>view>view": 2}


class TestAbLift:
    def test_hand_z_statistic(self, spark, tmp_path):
        """arm0: 2 users, 1 heavy purchaser; arm1: 2 users, both heavy.
        lift = 0.5, z = 0.5/sqrt(0.75*0.25*1) = 1.1547."""
        rows = []
        eid = 0

        def purchases(user, n):
            nonlocal eid
            for i in range(n):
                rows.append((eid, user, 1 + (i // 50), i % 50, "purchase", 1.0))
                eid += 1

        purchases(0, 14)   # arm 0, converted
        purchases(2, 1)    # arm 0, not converted
        purchases(1, 15)   # arm 1, converted
        purchases(3, 14)   # arm 1, converted
        sf = _write_events(tmp_path, rows)
        r = QUERIES["q_ab_lift"](spark, sf).collect()[0]
        assert (r["n0"], r["c0"], r["n1"], r["c1"]) == (2, 1, 2, 2)
        assert abs(r["lift_abs"] - 0.5) < 1e-6
        assert abs(r["z_stat"] - 0.5 / math.sqrt(0.1875)) < 1e-3
