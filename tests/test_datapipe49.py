"""Planted gates for wave 51: q_anova_f (C188) and q_mann_whitney
(C189)."""

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
    """rows = [(doc_id, source, n_chars)]"""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([f"t{r[0]}" for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, value)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# ------------------------------------------------ C188 one-way ANOVA


class TestAnovaF:
    def test_hand_math_two_groups(self, spark, tmp_path):
        """A: [1,3] (mean 2); B: [5,7] (mean 6). Grand mean 4.
        SSB = 2*(2-4)^2 + 2*(6-4)^2 = 16; SSW = 2+2 = 4.
        F = (16/1)/(4/2) = 8; eta^2 = 16/20 = 0.8."""
        rows = [(0, "A", 1), (1, "A", 3), (2, "B", 5), (3, "B", 7)]
        sf = _write_docs(tmp_path, rows)
        (r,) = QUERIES["q_anova_f"](spark, sf).collect()
        assert r.n_groups == 2 and r.n_rows == 4
        assert r.ssb == pytest.approx(16.0, abs=1e-6)
        assert r.ssw == pytest.approx(4.0, abs=1e-6)
        assert r.f_stat == pytest.approx(8.0, abs=1e-6)
        assert r.eta_sq == pytest.approx(0.8, abs=1e-6)

    def test_identical_groups_give_zero_f(self, spark, tmp_path):
        rows = [(i, ["A", "B", "C"][i % 3], 10 + (i // 3) % 4) for i in range(24)]
        sf = _write_docs(tmp_path, rows)
        (r,) = QUERIES["q_anova_f"](spark, sf).collect()
        assert r.f_stat == pytest.approx(0.0, abs=1e-6)
        assert r.eta_sq == pytest.approx(0.0, abs=1e-6)

    def test_fixture_nonneg_and_partition(self, spark, sf_dir):
        (r,) = QUERIES["q_anova_f"](spark, sf_dir).collect()
        assert r.ssb >= -1e-6 and r.ssw >= -1e-6
        assert 0.0 <= r.eta_sq <= 1.0
        assert r.f_stat is None or r.f_stat >= 0.0


# --------------------------------------- C189 Mann-Whitney U


def _reference_mw(pairs):
    """pairs = [(t, x)] -> (u_t, rank_biserial, z) with avg ranks."""
    xs = [x for _, x in pairs]
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    n = len(pairs)
    n_t = sum(t for t, _ in pairs)
    n_c = n - n_t
    r_t = sum(r for (t, _), r in zip(pairs, ranks) if t == 1)
    u = r_t - n_t * (n_t + 1) / 2
    rb = 2 * u / (n_t * n_c) - 1
    from collections import Counter

    tsum = sum(c**3 - c for c in Counter(xs).values() if c > 1)
    var = n_t * n_c / 12 * ((n + 1) - tsum / (n * (n - 1)))
    z = (u - n_t * n_c / 2) / math.sqrt(var) if var > 0 else None
    return u, rb, z


class TestMannWhitney:
    def test_clean_separation(self, spark, tmp_path):
        """All treated values above all control: U = n_t*n_c,
        rank-biserial = +1."""
        t_users = [u for u in range(200) if _treated(u)][:5]
        c_users = [u for u in range(200) if not _treated(u)][:5]
        rows = [(i, u, 100.0 + i) for i, u in enumerate(t_users)] + [
            (10 + i, u, 1.0 + i) for i, u in enumerate(c_users)
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_mann_whitney"](spark, sf).collect()
        assert (r.n_t, r.n_c) == (5, 5)
        assert r.u_t == pytest.approx(25.0, abs=1e-9)
        assert r.rank_biserial == pytest.approx(1.0, abs=1e-9)
        assert r.z > 2.5

    def test_python_replication_with_ties(self, spark, tmp_path):
        t_users = [u for u in range(200) if _treated(u)][:6]
        c_users = [u for u in range(200) if not _treated(u)][:6]
        vals_t = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0]
        vals_c = [2.0, 3.0, 3.0, 4.0, 5.0, 6.0]
        rows = [(i, u, v) for i, (u, v) in enumerate(zip(t_users, vals_t))]
        rows += [
            (10 + i, u, v) for i, (u, v) in enumerate(zip(c_users, vals_c))
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_mann_whitney"](spark, sf).collect()
        pairs = [(1, round(v * 100)) for v in vals_t] + [
            (0, round(v * 100)) for v in vals_c
        ]
        u, rb, z = _reference_mw(pairs)
        assert r.u_t == pytest.approx(u, abs=1e-6)
        assert r.rank_biserial == pytest.approx(rb, abs=1e-6)
        assert r.z == pytest.approx(z, abs=1e-5)

    def test_null_on_fixture(self, spark, sf_dir):
        (r,) = QUERIES["q_mann_whitney"](spark, sf_dir).collect()
        assert abs(r.z) < 4.0
        assert -0.2 < r.rank_biserial < 0.2
