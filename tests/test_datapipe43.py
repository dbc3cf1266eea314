"""Planted gates for wave 45: q_quantile_normalize (C179) and
q_jackknife_variance (C180)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


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
    """rows = [(event_id, event_type, value)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# ---------------------------------- C179 quantile normalization


class TestQuantileNormalize:
    def test_equal_groups_share_exact_distribution(self, spark, tmp_path):
        """Two groups of 4 with different raw scales: after the map,
        both carry the SAME multiset of normalized values (the
        defining property of quantile normalization)."""
        rows = [(i, "a", 10 * (i + 1)) for i in range(4)] + [
            (i + 4, "b", 1000 + i) for i in range(4)
        ]
        sf = _write_docs(tmp_path, rows)
        out = QUERIES["q_quantile_normalize"](spark, sf).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r.x_norm)
        assert sorted(by_src["a"]) == sorted(by_src["b"])

    def test_monotone_within_group(self, spark, sf_dir):
        """The map must preserve within-group order: a longer doc
        never normalizes below a shorter one in the same source."""
        out = QUERIES["q_quantile_normalize"](spark, sf_dir).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append((r.x, r.doc_id, r.x_norm))
        for rows in by_src.values():
            rows.sort()
            for a, b in zip(rows, rows[1:]):
                assert a[2] <= b[2]

    def test_values_come_from_global_distribution(self, spark, sf_dir, duck):
        out = QUERIES["q_quantile_normalize"](spark, sf_dir).collect()
        global_x = {
            v
            for (v,) in duck.execute(
                "SELECT DISTINCT n_chars FROM documents"
            ).fetchall()
        }
        assert {r.x_norm for r in out} <= global_x
        (n,) = duck.execute("SELECT count(*) FROM documents").fetchone()
        assert len(out) == n

    def test_singleton_group_maps_to_minimum(self, spark, tmp_path):
        """A 1-doc source has p = 0 (the explicit nullif/coalesce
        convention): it must receive the global minimum."""
        rows = [(0, "big", 100), (1, "big", 200), (2, "solo", 999)]
        sf = _write_docs(tmp_path, rows)
        out = {r.source: r for r in QUERIES["q_quantile_normalize"](spark, sf).collect() if r.source == "solo"}
        assert out["solo"].x_norm == 100


# ---------------------------------- C180 jackknife variance


class TestJackknifeVariance:
    def test_hand_math_two_strata(self, spark, tmp_path):
        """Strata A (2 rows, mean 1.0) and B (2 rows, mean 3.0):
        theta=(2+6)/4=2; loo: drop A -> 3.0, drop B -> 1.0;
        bar=2; SE = sqrt(1/2 * (1+1)) = 1."""
        rows = [
            (0, "A", 1.0),
            (1, "A", 1.0),
            (2, "B", 3.0),
            (3, "B", 3.0),
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_jackknife_variance"](spark, sf).collect()
        assert r.g == 2
        assert r.theta == pytest.approx(2.0, abs=1e-6)
        assert r.jack_se == pytest.approx(1.0, abs=1e-6)

    def test_identical_strata_have_zero_se(self, spark, tmp_path):
        rows = [(i, ["A", "B", "C"][i % 3], 5.0) for i in range(9)]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_jackknife_variance"](spark, sf).collect()
        assert r.theta == pytest.approx(5.0, abs=1e-6)
        assert r.jack_se == pytest.approx(0.0, abs=1e-6)

    def test_python_replication_on_fixture(self, spark, sf_dir, duck):
        (r,) = QUERIES["q_jackknife_variance"](spark, sf_dir).collect()
        cells = duck.execute(
            """SELECT event_type, count(*),
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT)
               FROM events GROUP BY 1 ORDER BY 1"""
        ).fetchall()
        N = sum(c[1] for c in cells)
        S = sum(c[2] for c in cells)
        g = len(cells)
        q8 = lambda x: math.floor(x * 1e8 + 0.5) / 1e8  # noqa: E731
        loo = [q8((S - s) / (100.0 * (N - n))) for _, n, s in cells]
        bar = q8(sum(loo) / g)
        d2 = [math.floor((t - bar) ** 2 * 1e10 + 0.5) / 1e10 for t in loo]
        se = math.sqrt((g - 1) / g * sum(d2))
        assert r.g == g
        assert r.jack_se == pytest.approx(se, abs=1e-5)
