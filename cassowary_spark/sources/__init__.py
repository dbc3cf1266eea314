"""Cassowary-native storage layer (SURVEY.md §2 group A).

A pure-Python implementation of the Cassandra 2.0-era SSTable on-disk
format (public knowledge of the Apache Cassandra storage engine;
reference checkout empty — SURVEY.md §0) plus a PySpark 4.x Python
DataSource (``spark.read.format("sstable")``) that scans snapshot
directories, merges multi-generation rows last-write-wins, suppresses
tombstones/TTL-expired cells, and prunes by partition key.
"""

from __future__ import annotations

from cassowary_spark.sources.sstable_datasource import (
    SSTableDataSource,
    register_sstable_source,
)

__all__ = ["SSTableDataSource", "register_sstable_source"]
