"""Planted gates for wave 36: q_diff_in_diff (C160) and
q_hard_negatives (C161)."""

from __future__ import annotations

import datetime as dt
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _treated(user_id: int) -> bool:
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16) % 2 == 1


def _write_events(tmp_path, rows):
    """rows = [(user_id, ts, value)]."""
    tbl = pa.table(
        {
            "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestDiffInDiff:
    def test_planted_effect_recovered_exactly(self, spark, tmp_path):
        """Treated users gain +2.0 in the post period; control users
        gain +0.5 (a common trend). DiD must isolate exactly 1.5."""
        treated = [u for u in range(1, 40) if _treated(u)][:4]
        control = [u for u in range(1, 40) if not _treated(u)][:4]
        pre = dt.datetime(2024, 1, 10)
        post = dt.datetime(2024, 1, 20)
        rows = []
        for u in treated:
            rows += [(u, pre, 10.0), (u, post, 12.0)]
        for u in control:
            rows += [(u, pre, 7.0), (u, post, 7.5)]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_diff_in_diff"](spark, sf).collect()
        assert (r.n_t_pre, r.n_t_post, r.n_c_pre, r.n_c_post) == (4, 4, 4, 4)
        assert r.m_t_pre == pytest.approx(10.0)
        assert r.m_t_post == pytest.approx(12.0)
        assert r.m_c_pre == pytest.approx(7.0)
        assert r.m_c_post == pytest.approx(7.5)
        assert r.did == pytest.approx(1.5, abs=1e-6)

    def test_fixture_cells_partition_the_table(self, spark, sf_dir, duck):
        (r,) = QUERIES["q_diff_in_diff"](spark, sf_dir).collect()
        (total,) = duck.execute("SELECT count(*) FROM events").fetchone()
        assert r.n_t_pre + r.n_t_post + r.n_c_pre + r.n_c_post == total
        assert min(r.n_t_pre, r.n_t_post, r.n_c_pre, r.n_c_post) > 0


def _write_embeddings(tmp_path, vecs):
    """vecs = [(vec_id, [floats], label)]."""
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


class TestHardNegatives:
    def test_same_label_neighbors_excluded(self, spark, tmp_path):
        """The nearest vector overall shares the anchor's label and
        must NOT appear; the mined negatives are the nearest
        wrong-label ones in similarity order."""
        anchor = [1.0, 0.0, 0.0, 0.0]
        vecs = [(i, anchor, 0) for i in range(5)]  # anchors, label 0
        vecs += [
            (10, [0.999, 0.01, 0.0, 0.0], 0),  # nearest but same label
            (11, [0.9, 0.1, 0.0, 0.0], 1),
            (12, [0.7, 0.3, 0.0, 0.0], 1),
            (13, [0.0, 1.0, 0.0, 0.0], 2),
            (14, [-1.0, 0.0, 0.0, 0.0], 2),
            (15, [0.5, 0.5, 0.0, 0.0], 1),
        ]
        sf = _write_embeddings(tmp_path, vecs)
        rows = [
            r
            for r in QUERIES["q_hard_negatives"](spark, sf).collect()
            if r.qid == 0
        ]
        ids = [r.vec_id for r in sorted(rows, key=lambda r: r.rnk)]
        assert 10 not in ids  # same-label exclusion
        # cos: 11=0.994, 12=0.919, 15=0.707, 13=0.0, 14=-1.0
        assert ids == [11, 12, 15, 13, 14]  # descending cosine order
        sims = [r.cos_sim for r in sorted(rows, key=lambda r: r.rnk)]
        assert sims == sorted(sims, reverse=True)
        assert sims[0] == pytest.approx(0.9 / (0.9**2 + 0.1**2) ** 0.5, abs=1e-4)

    def test_fixture_shape_and_label_constraint(self, spark, sf_dir, duck):
        rows = QUERIES["q_hard_negatives"](spark, sf_dir).collect()
        labels = dict(
            duck.execute("SELECT vec_id, label FROM embeddings").fetchall()
        )
        per_q = {}
        for r in rows:
            per_q.setdefault(r.qid, []).append(r)
            assert labels[r.vec_id] != labels[r.qid]
            assert r.vec_id >= 5
        assert set(per_q) == set(range(5))
        for qid, rs in per_q.items():
            assert sorted(r.rnk for r in rs) == [1, 2, 3, 4, 5]
