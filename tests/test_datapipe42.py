"""Planted gates for wave 44: q_srm_check (C176), q_simpson_flip
(C177), q_hill_tail_index (C178)."""

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


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, event_type, value)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 6, 0)] * len(rows),
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


# ----------------------------------------------- C176 SRM guardrail


class TestSrmCheck:
    def test_hash_randomized_fixture_passes(self, spark, sf_dir):
        (r,) = QUERIES["q_srm_check"](spark, sf_dir).collect()
        assert r.n_t > 0 and r.n_c > 0
        assert r.srm_flag == 0  # md5 split really is ~50/50
        assert r.chi2 < 3.841459

    def test_planted_mismatch_flags(self, spark, tmp_path):
        """A fixture built from 40 treated and 5 control users is a
        gross SRM: chi2 = (40-22.5)^2/22.5 * 2 ≈ 27 >> 3.84."""
        t_users = [u for u in range(500) if _treated(u)][:40]
        c_users = [u for u in range(500) if not _treated(u)][:5]
        rows = [
            (i, u, "view", 1.0)
            for i, u in enumerate(t_users + c_users)
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_srm_check"](spark, sf).collect()
        assert (r.n_t, r.n_c) == (40, 5)
        assert r.chi2 == pytest.approx((17.5**2 / 22.5) * 2, abs=1e-4)
        assert r.srm_flag == 1

    def test_counts_are_per_unit_not_per_event(self, spark, tmp_path):
        """One whale user with 100 events must count ONCE."""
        t_user = next(u for u in range(100) if _treated(u))
        c_user = next(u for u in range(100) if not _treated(u))
        rows = [(i, t_user, "view", 1.0) for i in range(100)] + [
            (100, c_user, "view", 1.0)
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_srm_check"](spark, sf).collect()
        assert (r.n_t, r.n_c) == (1, 1)
        assert r.srm_flag == 0


# ------------------------------------- C177 Simpson direction audit


class TestSimpsonFlip:
    def test_planted_full_reversal(self, spark, tmp_path):
        """Classic construction: treated wins INSIDE both strata, but
        treated mass concentrates in the low-value stratum, so the
        pooled diff flips negative -> full reversal flagged."""
        t, c = [], []
        for u in range(400):
            (t if _treated(u) else c).append(u)
        rows = []
        eid = 0
        # stratum A (low values): 30 treated @ 2.0, 3 control @ 1.0
        for u in t[:30]:
            rows.append((eid, u, "A", 2.0)); eid += 1
        for u in c[:3]:
            rows.append((eid, u, "A", 1.0)); eid += 1
        # stratum B (high values): 3 treated @ 10.0, 30 control @ 9.0
        for u in t[30:33]:
            rows.append((eid, u, "B", 10.0)); eid += 1
        for u in c[3:33]:
            rows.append((eid, u, "B", 9.0)); eid += 1
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_simpson_flip"](spark, sf).collect()
        # within-stratum: +1.0 in both; pooled: treated mean
        # (30*2+3*10)/33 ≈ 2.727 vs control (3*1+30*9)/33 ≈ 8.273
        assert r.pooled_diff < 0
        assert r.n_strata == 2 and r.n_opposing == 2
        assert r.simpson_flag == 1

    def test_no_flip_on_consistent_data(self, spark, tmp_path):
        t_user = next(u for u in range(100) if _treated(u))
        c_user = next(u for u in range(100) if not _treated(u))
        rows = [
            (0, t_user, "A", 5.0),
            (1, c_user, "A", 3.0),
            (2, t_user, "B", 8.0),
            (3, c_user, "B", 6.0),
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_simpson_flip"](spark, sf).collect()
        assert r.pooled_diff > 0
        assert r.n_opposing == 0 and r.simpson_flag == 0

    def test_fixture_shape(self, spark, sf_dir):
        (r,) = QUERIES["q_simpson_flip"](spark, sf_dir).collect()
        assert r.n_strata > 0
        assert 0 <= r.n_opposing <= r.n_strata


# ---------------------------------------- C178 Hill tail index


class TestHillTailIndex:
    def test_exact_pareto_recovers_alpha(self, spark, tmp_path):
        """Plant a deterministic Pareto(α=2) grid: x_i = i^(-1/2)
        scaled — the Hill estimator over the top-k must land near
        1/α = 0.5 (exact quantile grid, not a random draw, so the
        tolerance is tight-ish)."""
        alpha = 2.0
        n = 2000
        rows = [
            (i, i, "view", 100.0 * ((i + 1) / n) ** (-1.0 / alpha))
            for i in range(n)
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_hill_tail_index"](spark, sf).collect()
        assert r.k == 100
        assert r.hill_mean_log_excess == pytest.approx(
            1.0 / alpha, rel=0.08
        )
        assert r.tail_index == pytest.approx(alpha, rel=0.08)

    def test_bounded_support_has_large_index(self, spark, tmp_path):
        """Near-constant values => tiny log-excesses => huge α̂
        (a light tail reads as 'no tail')."""
        rows = [(i, i, "view", 10.0 + 0.001 * (i % 7)) for i in range(500)]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_hill_tail_index"](spark, sf).collect()
        assert r.tail_index is None or r.tail_index > 20

    def test_fixture_sane(self, spark, sf_dir):
        (r,) = QUERIES["q_hill_tail_index"](spark, sf_dir).collect()
        assert r.k == 100
        assert r.hill_mean_log_excess >= 0.0
        if r.tail_index is not None:
            assert r.tail_index > 0
        # python replication of the exact estimator
        import duckdb as _d

        con = _d.connect()
        vals = [
            v
            for (v,) in con.execute(
                f"""SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                    FROM read_parquet('{sf_dir}/events.parquet')
                    WHERE value > 0"""
            ).fetchall()
        ]
        top = sorted(vals, reverse=True)[:101]
        ck = top[100]
        h = sum(
            math.floor(math.log(x / ck) * 1e8 + 0.5) / 1e8 for x in top[:100]
        ) / 100
        assert r.hill_mean_log_excess == pytest.approx(h, abs=1e-5)
