"""Planted gates for wave 48: q_transition_entropy (C183) and
q_dup_cluster_sizes (C184)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, minute, event_type)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 8, r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# ------------------------------ C183 transition conditional entropy


class TestTransitionEntropy:
    def test_deterministic_funnel_has_zero_entropy(self, spark, tmp_path):
        # every view is ALWAYS followed by click: H(next|view) = 0
        rows = []
        eid = 0
        for u in range(5):
            for m, t in ((0, "view"), (1, "click"), (2, "view"), (3, "click")):
                rows.append((eid, u, m, t))
                eid += 1
        sf = _write_events(tmp_path, rows)
        out = {r.event_type: r for r in QUERIES["q_transition_entropy"](spark, sf).collect()}
        assert out["view"].h_next_nats == pytest.approx(0.0, abs=1e-9)
        # click -> view always (except each user's last event)
        assert out["click"].h_next_nats == pytest.approx(0.0, abs=1e-9)

    def test_uniform_successors_hit_ln_k(self, spark, tmp_path):
        # after 'a', successors b/c/d exactly once each: H = ln 3
        rows = []
        eid = 0
        for u, nxt in enumerate(("b", "c", "d")):
            rows.append((eid, u, 0, "a")); eid += 1
            rows.append((eid, u, 1, nxt)); eid += 1
        sf = _write_events(tmp_path, rows)
        out = {r.event_type: r for r in QUERIES["q_transition_entropy"](spark, sf).collect()}
        assert out["a"].n_transitions == 3
        assert out["a"].h_next_nats == pytest.approx(math.log(3), abs=1e-6)

    def test_fixture_bounds(self, spark, sf_dir, duck):
        rows = QUERIES["q_transition_entropy"](spark, sf_dir).collect()
        assert rows
        (k,) = duck.execute(
            "SELECT count(DISTINCT event_type) FROM events"
        ).fetchone()
        for r in rows:
            assert -1e-9 <= r.h_next_nats <= math.log(k) + 1e-9


# --------------------------- C184 duplicate-cluster size distribution


class TestDupClusterSizes:
    def test_hand_histogram(self, spark, tmp_path):
        texts = ["a", "a", "a", "b", "b", "c", "d", "e"]
        sf = _write_docs(tmp_path, texts)
        out = {r.cluster_size: r for r in QUERIES["q_dup_cluster_sizes"](spark, sf).collect()}
        assert out[3].n_clusters == 1 and out[3].n_docs == 3
        assert out[2].n_clusters == 1 and out[2].n_docs == 2
        assert out[1].n_clusters == 3 and out[1].n_docs == 3
        assert set(out) == {1, 2, 3}

    def test_accounting_identities(self, spark, sf_dir, duck):
        rows = QUERIES["q_dup_cluster_sizes"](spark, sf_dir).collect()
        (n_docs,) = duck.execute("SELECT count(*) FROM documents").fetchone()
        (n_clusters,) = duck.execute(
            "SELECT count(DISTINCT md5(text)) FROM documents"
        ).fetchone()
        assert sum(r.n_docs for r in rows) == n_docs
        assert sum(r.n_clusters for r in rows) == n_clusters
        for r in rows:
            assert r.n_docs == r.cluster_size * r.n_clusters
