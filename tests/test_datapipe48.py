"""Planted gates for wave 50: q_partition_balance (C187)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassowary_spark import registry
from cassowary_spark.registry import QUERIES

registry.load_all()


def _bucket(user_id: int, k: int = 32) -> int:
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16) % k


def _write_events(tmp_path, user_ids):
    import datetime

    n = len(user_ids)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)] * n, pa.timestamp("us")
            ),
            "user_id": pa.array(user_ids, pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestPartitionBalance:
    def test_python_replication(self, spark, tmp_path):
        users = [u for u in range(300)]
        sf = _write_events(tmp_path, users)
        (r,) = QUERIES["q_partition_balance"](spark, sf).collect()
        counts = {}
        for u in users:
            b = _bucket(u)
            counts[b] = counts.get(b, 0) + 1
        assert r.n_total == 300
        assert r.n_buckets == len(counts)
        assert r.max_rows == max(counts.values())
        assert r.min_rows == min(counts.values())
        imb = max(counts.values()) * len(counts) / 300
        assert r.imbalance == pytest.approx(imb, abs=1e-6)

    def test_whale_key_flags(self, spark, tmp_path):
        """One user contributing 80% of rows must trip the 1.5x
        straggler flag."""
        users = [7] * 800 + list(range(100, 300))
        sf = _write_events(tmp_path, users)
        (r,) = QUERIES["q_partition_balance"](spark, sf).collect()
        assert r.skew_flag == 1
        assert r.imbalance > 1.5

    def test_fixture_flag_consistent_with_ratio(self, spark, sf_dir):
        """Whatever the fixture's user cardinality (the sf0.001 rig
        has few users, so occupancy and imbalance vary by scale), the
        reported numbers must be internally consistent and the flag
        must equal the quantized-ratio rule."""
        (r,) = QUERIES["q_partition_balance"](spark, sf_dir).collect()
        assert 1 <= r.n_buckets <= 32
        assert r.min_rows <= r.max_rows <= r.n_total
        assert r.imbalance >= 1.0 - 1e-9
        assert r.skew_flag == (1 if r.imbalance > 1.5 else 0)
