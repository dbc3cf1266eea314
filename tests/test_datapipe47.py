"""Planted gates for wave 49: q_lexical_diversity (C185) and
q_mh_odds_ratio (C186)."""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _treated(user_id: int) -> int:
    u32 = int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16)
    return u32 % 2


def _write_docs(tmp_path, rows):
    """rows = [(doc_id, text, source)]"""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, day, event_type)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, r[2], 10) for r in rows],
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


# --------------------------------------------- C185 lexical diversity


class TestLexicalDiversity:
    def test_hand_counts(self, spark, tmp_path):
        rows = [
            (0, "a b a c", "rich"),  # 4 tokens, 3 types
            (1, "d e", "rich"),  # rich: 6 tokens, 5 types
            (2, "spam spam spam", "dull"),
            (3, "spam spam spam", "dull"),  # dull: 6 tokens, 1 type
        ]
        sf = _write_docs(tmp_path, rows)
        out = {r.source: r for r in QUERIES["q_lexical_diversity"](spark, sf).collect()}
        assert (out["rich"].n_tokens, out["rich"].n_types) == (6, 5)
        assert out["rich"].ttr == pytest.approx(5 / 6, abs=1e-6)
        assert out["rich"].root_ttr == pytest.approx(5 / math.sqrt(6), abs=1e-6)
        assert (out["dull"].n_tokens, out["dull"].n_types) == (6, 1)
        assert out["dull"].ttr == pytest.approx(1 / 6, abs=1e-6)

    def test_boilerplate_source_scores_lower(self, spark, tmp_path):
        rows = [(i, "the same template text", "tpl") for i in range(10)] + [
            (10 + i, f"unique words here {i} alpha{i} beta{i}", "var")
            for i in range(10)
        ]
        sf = _write_docs(tmp_path, rows)
        out = {r.source: r for r in QUERIES["q_lexical_diversity"](spark, sf).collect()}
        assert out["tpl"].ttr < out["var"].ttr
        assert out["tpl"].root_ttr < out["var"].root_ttr

    def test_fixture_bounds(self, spark, sf_dir):
        rows = QUERIES["q_lexical_diversity"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 < r.ttr <= 1.0
            assert r.n_types <= r.n_tokens


# ----------------------------------------- C186 Mantel-Haenszel OR


class TestMhOddsRatio:
    def test_planted_or_recovered_single_stratum(self, spark, tmp_path):
        """One stratum with a=20 b=10 c=10 d=20: OR = 4."""
        t_users = [u for u in range(400) if _treated(u)]
        c_users = [u for u in range(400) if not _treated(u)]
        rows = []
        eid = 0
        for i in range(30):
            # treated: 20 purchases, 10 views
            rows.append((eid, t_users[i], 3, "purchase" if i < 20 else "view"))
            eid += 1
            # control: 10 purchases, 20 views
            rows.append((eid, c_users[i], 3, "purchase" if i < 10 else "view"))
            eid += 1
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_mh_odds_ratio"](spark, sf).collect()
        assert r.n_strata == 1
        assert r.mh_or == pytest.approx(4.0, abs=1e-4)

    def test_confounded_strata_pool_correctly(self, spark, tmp_path):
        """Two strata each with within-stratum OR = 1 but very
        different base rates: MH must report 1 (the Simpson-proof
        property), even though the naive pooled 2x2 would not."""
        t_users = [u for u in range(2000) if _treated(u)]
        c_users = [u for u in range(2000) if not _treated(u)]
        rows = []
        eid = 0
        ti = ci = 0

        def emit(day, n_t, pt, n_c, pc):
            nonlocal eid, ti, ci
            for i in range(n_t):
                rows.append((eid, t_users[ti], day,
                             "purchase" if i < pt else "view"))
                eid += 1
                ti += 1
            for i in range(n_c):
                rows.append((eid, c_users[ci], day,
                             "purchase" if i < pc else "view"))
                eid += 1
                ci += 1

        # stratum wk0: high rate 50%; treated-heavy (80 vs 20)
        emit(2, 80, 40, 20, 10)
        # stratum wk3: low rate 10%; control-heavy (20 vs 80)
        emit(23, 20, 2, 80, 8)
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_mh_odds_ratio"](spark, sf).collect()
        assert r.n_strata == 2
        assert r.mh_or == pytest.approx(1.0, abs=1e-6)

    def test_null_association_on_fixture(self, spark, sf_dir):
        (r,) = QUERIES["q_mh_odds_ratio"](spark, sf_dir).collect()
        assert r.n_strata >= 1
        assert 0.5 < r.mh_or < 2.0  # hash treatment: OR ~ 1
