"""Fault-injection tests for the SSTable read path.

A corrupt or truncated snapshot component must fail LOUDLY with a
descriptive error — never decode garbage rows or silently misfilter.
(The chunk checksum is Cassandra 2.0's own per-chunk adler32; the
bloom/statistics parsers already refuse foreign layouts — these tests
pin that behavior against regressions.)
"""

from __future__ import annotations

import glob
import os

import pytest

from cassowary_spark.sources.sstable_format import (
    Cell,
    Partition,
    SSTableReader,
    SSTableWriter,
)
from cassowary_spark.sources.validators import get_validator

SCHEMA = {
    "key": ["id", "LongType"],
    "columns": [["name", "UTF8Type"], ["score", "DoubleType"]],
}

_LONG = get_validator("LongType").encode


def _write_snapshot(tmp_path, n=200) -> str:
    w = SSTableWriter(str(tmp_path), "ks", "cf", 1, SCHEMA, chunk_len=4096)
    for i in range(n):
        w.append(
            Partition(
                _LONG(i),
                cells=[
                    Cell(b"name", f"row{i}".encode(), 1),
                    Cell(b"score", get_validator("DoubleType").encode(i / 2), 1),
                ],
            )
        )
    w.close()
    return glob.glob(str(tmp_path / "*-Data.db"))[0][: -len("-Data.db")]


def _scan_all(prefix: str) -> list:
    r = SSTableReader(prefix)
    return list(r.scan())


def test_clean_snapshot_reads(tmp_path):
    assert len(_scan_all(_write_snapshot(tmp_path))) == 200


def test_corrupt_chunk_payload_raises(tmp_path):
    prefix = _write_snapshot(tmp_path)
    path = prefix + "-Data.db"
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.seek(size // 2)
        b = f.read(1)
        f.seek(size // 2)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises((IOError, ValueError), match="corrupt|chunk"):
        _scan_all(prefix)


def test_truncated_data_file_raises(tmp_path):
    prefix = _write_snapshot(tmp_path)
    path = prefix + "-Data.db"
    with open(path, "r+b") as f:
        f.truncate(os.path.getsize(path) // 2)
    with pytest.raises((IOError, ValueError)):
        _scan_all(prefix)


def test_corrupt_bloom_filter_fails_open(tmp_path):
    """A garbage Filter.db must fail OPEN: the bloom is a pruning
    optimization, so an unreadable one must never produce a false
    negative (dropping matching rows) — might_contain says True and a
    full scan still returns every row."""
    prefix = _write_snapshot(tmp_path)
    with open(prefix + "-Filter.db", "wb") as f:
        f.write(b"\x00\x01garbage-not-a-filter")
    r = SSTableReader(prefix)
    assert r.might_contain(_LONG(5)) is True
    assert len(list(r.scan())) == 200


def test_truncated_statistics_raises_descriptive(tmp_path):
    prefix = _write_snapshot(tmp_path)
    with open(prefix + "-Statistics.db", "r+b") as f:
        f.truncate(7)
    with pytest.raises(ValueError):
        SSTableReader(prefix)


def test_corrupt_compression_info_raises(tmp_path):
    prefix = _write_snapshot(tmp_path)
    with open(prefix + "-CompressionInfo.db", "r+b") as f:
        f.seek(0)
        f.write(b"\xff" * 8)
    with pytest.raises((IOError, ValueError, KeyError)):
        _scan_all(prefix)
