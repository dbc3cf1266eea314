"""Planted gates for wave 53: q_tost_equivalence (C192) and
q_holm_correction (C193)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _treated(user_id: int) -> int:
    u32 = int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16)
    return u32 % 2


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, event_type, value)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 5)] * len(rows),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _split_users(n):
    t = [u for u in range(10 * n) if _treated(u)][:n]
    c = [u for u in range(10 * n) if not _treated(u)][:n]
    return t, c


# -------------------------------------------- C192 TOST equivalence


class TestTostEquivalence:
    def test_identical_arms_are_equivalent(self, spark, tmp_path):
        t_users, c_users = _split_users(120)
        rows = [(i, u, "view", 10.0 + (i % 5)) for i, u in enumerate(t_users)]
        rows += [
            (500 + i, u, "view", 10.0 + (i % 5))
            for i, u in enumerate(c_users)
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_tost_equivalence"](spark, sf).collect()
        assert r.diff == pytest.approx(0.0, abs=1e-6)
        assert r.equivalent == 1
        assert min(r.z_lower, r.z_upper) > 1.644854

    def test_large_shift_is_not_equivalent(self, spark, tmp_path):
        """+5.00 shift against a ±2.00 margin: z_upper < 0, fail."""
        t_users, c_users = _split_users(100)
        rows = [(i, u, "view", 15.0 + (i % 3)) for i, u in enumerate(t_users)]
        rows += [
            (500 + i, u, "view", 10.0 + (i % 3))
            for i, u in enumerate(c_users)
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_tost_equivalence"](spark, sf).collect()
        assert r.diff == pytest.approx(5.0, abs=0.01)
        assert r.z_upper < 0
        assert r.equivalent == 0

    def test_underpowered_data_cannot_claim_equivalence(
        self, spark, tmp_path
    ):
        """Two rows per arm with huge spread: even a 0 diff must NOT
        certify equivalence (the property that separates TOST from
        'the t-test wasn't significant')."""
        t_users, c_users = _split_users(2)
        rows = [
            (0, t_users[0], "view", 1.0),
            (1, t_users[1], "view", 99.0),
            (2, c_users[0], "view", 1.0),
            (3, c_users[1], "view", 99.0),
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_tost_equivalence"](spark, sf).collect()
        assert r.diff == pytest.approx(0.0, abs=1e-6)
        assert r.equivalent == 0  # SE is enormous: CI escapes margin

    def test_fixture_flag_consistent(self, spark, sf_dir):
        """Whatever the fixture's traffic (sf0.001's 1000 events may
        legitimately be too few to CERTIFY equivalence — that is
        TOST working), the verdict must equal the quantized rule."""
        (r,) = QUERIES["q_tost_equivalence"](spark, sf_dir).collect()
        assert abs(r.diff) < 2.0  # true difference is 0
        assert r.equivalent == (
            1 if min(r.z_lower, r.z_upper) > 1.644854 else 0
        )


# ------------------------------------------ C193 Holm correction


class TestHolmCorrection:
    def test_null_family_rejects_nothing(self, spark, sf_dir):
        rows = QUERIES["q_holm_correction"](spark, sf_dir).collect()
        assert rows
        assert all(r.rejected == 0 for r in rows)

    def test_planted_shift_rejected_alone(self, spark, tmp_path):
        """One segment with a massive shift, four null segments: the
        shifted one is rejected at rank 1 and the step-down stops
        before dragging any sibling along."""
        t_users, c_users = _split_users(400)
        rows = []
        eid = 0
        for seg in ("a", "b", "c", "d", "shifted"):
            lift = 50.0 if seg == "shifted" else 0.0
            for i in range(60):
                rows.append(
                    (eid, t_users[eid % 400], seg, 10.0 + (i % 4) + lift)
                )
                eid += 1
                rows.append((eid, c_users[eid % 400], seg, 10.0 + (i % 4)))
                eid += 1
        sf = _write_events(tmp_path, rows)
        out = {r.event_type: r for r in QUERIES["q_holm_correction"](spark, sf).collect()}
        assert out["shifted"].rnk == 1 and out["shifted"].rejected == 1
        for seg in ("a", "b", "c", "d"):
            assert out[seg].rejected == 0, seg

    def test_step_down_monotone(self, spark, sf_dir):
        """rejected flags must be a prefix of the |z|-descending
        ranking (the defining step-down property)."""
        rows = sorted(
            QUERIES["q_holm_correction"](spark, sf_dir).collect(),
            key=lambda r: r.rnk,
        )
        flags = [r.rejected for r in rows]
        assert flags == sorted(flags, reverse=True)
