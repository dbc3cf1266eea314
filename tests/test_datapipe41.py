"""Planted gates for wave 43: q_bloom_skip (A31) and q_cem_att
(C175)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


# --------------------------------------- A31 Bloom-filter skipping


class TestBloomSkip:
    def test_no_false_negatives_for_every_doc(self, spark, sf_dir):
        """The Bloom contract: for EVERY doc_id, the candidate set
        must contain the file that actually holds it (checked via the
        file->ids ground truth; probing all ids would be slow, so a
        deterministic sample of 25 ids is probed)."""
        from pyspark.sql import functions as F

        from cassowary_spark.queries.datapipe41 import (
            bloom_candidate_files,
            ensure_bloom_lake,
        )

        data, _ = ensure_bloom_lake(spark, sf_dir)
        truth = {
            r.doc_id: r.fp
            for r in spark.read.parquet(data)
            .select("doc_id", F.col("_metadata.file_path").alias("fp"))
            .collect()
        }
        ids = sorted(truth)[::
            max(1, len(truth) // 25)]  # ~25 evenly spaced probes
        for i in ids:
            cands = bloom_candidate_files(spark, sf_dir, i)
            assert truth[i] in cands, i

    def test_skips_most_files_on_point_probe(self, spark, sf_dir):
        from cassowary_spark.queries.datapipe41 import (
            _BF_TARGET,
            bloom_candidate_files,
        )

        cands = bloom_candidate_files(spark, sf_dir, _BF_TARGET)
        # fp rate ~8e-4: the target lives in exactly one file, and a
        # false positive on even 3 more files would be a 1-in-10^8 fluke
        assert 1 <= len(cands) <= 4

    def test_lookup_row_matches_truth(self, spark, sf_dir, duck):
        from cassowary_spark.queries.datapipe41 import _BF_TARGET

        (r,) = QUERIES["q_bloom_skip"](spark, sf_dir).collect()
        (truth,) = duck.execute(
            f"""SELECT doc_id, lang, source, CAST(n_chars AS BIGINT)
                FROM documents WHERE doc_id = {_BF_TARGET}"""
        ).fetchall()
        assert (r.doc_id, r.lang, r.source, r.n_chars) == truth

    def test_positions_match_spark_and_python(self, spark, sf_dir):
        """The probe only works if the driver-side position hash is
        bit-identical to the build's Spark-side hash."""
        from pyspark.sql import functions as F

        from cassowary_spark.queries.datapipe41 import (
            _bf_positions_col,
            _bf_positions_py,
        )

        df = spark.range(7, 12).select(F.col("id").alias("doc_id"))
        rows = df.select(
            "doc_id", F.array(*_bf_positions_col(F.col("doc_id"))).alias("p")
        ).collect()
        for r in rows:
            assert list(r.p) == _bf_positions_py(r.doc_id)


# ------------------------- C175 coarsened-exact-matching ATT


def _treated(user_id: int) -> int:
    u32 = int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16)
    return u32 % 2


def _write_events(tmp_path, rows):
    """rows = [(event_id, user_id, event_type, hour, value)]"""
    import datetime

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [
                    datetime.datetime(2024, 1, 1, r[3], 30)
                    for r in rows
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestCemAtt:
    def test_planted_effect_recovered(self, spark, tmp_path):
        """One stratum, treated rows exactly +5.00 above control:
        ATT must be 5.0."""
        t_user = next(u for u in range(100) if _treated(u))
        c_user = next(u for u in range(100) if not _treated(u))
        rows = [
            (1, t_user, "view", 3, 15.0),
            (2, t_user, "view", 4, 17.0),
            (3, c_user, "view", 3, 10.0),
            (4, c_user, "view", 4, 12.0),
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_cem_att"](spark, sf).collect()
        assert r.n_strata == 1 and r.n_treated == 2
        assert r.att == pytest.approx(5.0, abs=1e-6)

    def test_unmatched_strata_excluded(self, spark, tmp_path):
        """A stratum with only treated (or only control) rows must not
        contribute — its outcome would be uncounterfactual."""
        t_user = next(u for u in range(100) if _treated(u))
        c_user = next(u for u in range(100) if not _treated(u))
        rows = [
            # matched stratum (view, q0): diff +2
            (1, t_user, "view", 2, 12.0),
            (2, c_user, "view", 2, 10.0),
            # treated-only stratum (click, q2): must be DROPPED
            (3, t_user, "click", 13, 999.0),
            # control-only stratum (view, q3): must be DROPPED
            (4, c_user, "view", 20, 555.0),
        ]
        sf = _write_events(tmp_path, rows)
        (r,) = QUERIES["q_cem_att"](spark, sf).collect()
        assert r.n_strata == 1 and r.n_treated == 1
        assert r.att == pytest.approx(2.0, abs=1e-6)

    def test_null_effect_on_fixture(self, spark, sf_dir):
        """Treatment is a user-id hash bit on synthetic data: the true
        effect is 0, so |ATT| must be small relative to the outcome
        scale (loose 10% of mean-value bound)."""
        import duckdb as _d

        (r,) = QUERIES["q_cem_att"](spark, sf_dir).collect()
        assert r.n_strata > 0 and r.n_treated > 0
        con = _d.connect()
        (mean_v,) = con.execute(
            f"SELECT avg(value) FROM read_parquet('{sf_dir}/events.parquet')"
        ).fetchone()
        assert abs(r.att) < 0.10 * mean_v
