"""Planted gates for wave 52: q_kruskal_wallis (C190) and q_cuped
(C191)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

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
    """rows = [(event_id, user_id, day, event_type, value)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, r[2], 9) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# ------------------------------------------- C190 Kruskal-Wallis


def _reference_kw(groups):
    """groups = {name: [values]} -> tie-corrected H."""
    allv = [(g, v) for g, vs in groups.items() for v in vs]
    xs = [v for _, v in allv]
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
    n = len(allv)
    rsum = {}
    for (g, _), r in zip(allv, ranks):
        rsum[g] = rsum.get(g, 0.0) + r
    h = 12 / (n * (n + 1)) * sum(
        rs * rs / len(groups[g]) for g, rs in rsum.items()
    ) - 3 * (n + 1)
    tsum = sum(c**3 - c for c in Counter(xs).values() if c > 1)
    return h / (1 - tsum / (n**3 - n))


class TestKruskalWallis:
    def test_python_replication_with_ties(self, spark, tmp_path):
        groups = {
            "a": [1.0, 2.0, 2.0, 5.0],
            "b": [2.0, 3.0, 6.0],
            "c": [4.0, 4.0, 7.0, 8.0, 8.0],
        }
        rows = []
        eid = 0
        for g, vs in groups.items():
            for v in vs:
                rows.append((eid, eid, 5, g, v))
                eid += 1
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_kruskal_wallis"](spark, sf).collect()
        expect = _reference_kw(
            {g: [round(v * 100) for v in vs] for g, vs in groups.items()}
        )
        assert r.n_groups == 3 and r.n_rows == 12
        assert r.h_stat == pytest.approx(expect, abs=1e-4)

    def test_identical_groups_near_zero(self, spark, tmp_path):
        rows = [
            (i, i, 5, ["a", "b", "c"][i % 3], float(1 + (i // 3) % 5))
            for i in range(30)
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_kruskal_wallis"](spark, sf).collect()
        assert abs(r.h_stat) < 1.0  # same distribution per group

    def test_fixture_sane(self, spark, sf_dir):
        (r,) = QUERIES["q_kruskal_wallis"](spark, sf_dir).collect()
        assert r.n_groups >= 2
        assert r.h_stat >= -1e-6


# -------------------------------------------------- C191 CUPED


class TestCuped:
    def test_perfect_pre_post_correlation_kills_variance(
        self, spark, tmp_path
    ):
        """y == x per user: theta = 1, rho^2 = 1, and the adjusted
        diff is exactly 0 (all outcome variance explained)."""
        rows = []
        eid = 0
        for u in range(40):
            v = float(10 + (u % 7))
            rows.append((eid, u, 5, "view", v)); eid += 1   # pre
            rows.append((eid, u, 20, "view", v)); eid += 1  # post == pre
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_cuped"](spark, sf).collect()
        assert r.theta == pytest.approx(1.0, abs=1e-6)
        assert r.var_reduction == pytest.approx(1.0, abs=1e-6)
        assert r.cuped_diff == pytest.approx(0.0, abs=1e-6)

    def test_planted_effect_survives_adjustment(self, spark, tmp_path):
        """Outcome = pre + 5.00 for treated, pre + 0 for control, with
        varying pre: theta ~= 1 and the adjusted diff recovers 5.00
        (CUPED removes pre-period variance, not the effect)."""
        t_users = [u for u in range(400) if _treated(u)][:20]
        c_users = [u for u in range(400) if not _treated(u)][:20]
        rows = []
        eid = 0
        for i, u in enumerate(t_users):
            pre = float(10 + i)
            rows.append((eid, u, 5, "view", pre)); eid += 1
            rows.append((eid, u, 20, "view", pre + 5.0)); eid += 1
        for i, u in enumerate(c_users):
            pre = float(10 + i)
            rows.append((eid, u, 5, "view", pre)); eid += 1
            rows.append((eid, u, 20, "view", pre)); eid += 1
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_cuped"](spark, sf).collect()
        assert r.n_users == 40 and r.n_treated == 20
        assert r.theta == pytest.approx(1.0, abs=0.02)
        assert r.cuped_diff == pytest.approx(5.0, abs=0.15)
        # rho^2 < 1 here BECAUSE the planted effect itself is outcome
        # variance the pre-period can't explain (2.5^2 of arm shift
        # vs ~133 of pre spread -> ~0.84)
        assert r.var_reduction > 0.8

    def test_fixture_python_replication(self, spark, sf_dir, duck):
        """Exact replication from per-user sums (the sf0.001 rig has
        only ~15 users, so magnitude bands are meaningless — the
        check is exact arithmetic instead)."""
        (r,) = QUERIES["q_cuped"](spark, sf_dir).collect()
        assert r.n_users > 0 and 0.0 <= r.var_reduction <= 1.0
        rows = duck.execute(
            """SELECT user_id,
               CAST(sum(CASE WHEN day(ts) < 16
                    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN day(ts) >= 16
                    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT)
               FROM events GROUP BY user_id"""
        ).fetchall()
        q8 = lambda v: math.floor(v * 1e8 + 0.5) / 1e8  # noqa: E731
        n = len(rows)
        sx = sum(x for _, x, _ in rows)
        sy = sum(y for _, _, y in rows)
        sxy = sum(x * y for _, x, y in rows)
        sxx = sum(x * x for _, x, _ in rows)
        theta = q8((n * sxy - sx * sy) / (n * sxx - sx * sx))
        arms = {0: [0, 0, 0], 1: [0, 0, 0]}
        for u, x, y in rows:
            a = arms[_treated(u)]
            a[0] += 1
            a[1] += x
            a[2] += y
        q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
        adj = {
            t: q6((c[2] - theta * c[1]) / (100.0 * c[0]))
            for t, c in arms.items()
        }
        assert r.n_users == n and r.n_treated == arms[1][0]
        assert r.theta == pytest.approx(theta, abs=1e-6)
        assert r.cuped_diff == pytest.approx(adj[1] - adj[0], abs=1e-5)
