"""Local oracle-differential harness (SURVEY.md §5).

Mirrors the driver's check: run a registered query on Spark and its
oracle SQL on DuckDB over the same parquet, then compare row count,
column names, and an order-insensitive multiset of normalized values.
Used by pytest before handoff so driver-side mismatches are caught
locally first.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from cassowary_spark.tables import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the fixture tables registered as views
    (same names the driver pre-registers)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _norm_cell(v: Any) -> Any:
    """Normalize a cell to a hashable, engine-independent token."""
    if v is None:
        return "<NULL>"
    if isinstance(v, np.generic):
        v = v.item()  # numpy scalars repr differently from python scalars
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"  # pandas renders SQL NULL doubles as NaN
        if v == 0.0:
            v = 0.0  # collapse -0.0 / +0.0
        # Tag floats so int64 462 != double 462.0 — the driver's value
        # hash is type-sensitive, and Python's 462 == 462.0 would mask
        # exactly the LONG-vs-DOUBLE divergence that failed q_fn_math
        # in round 1. Tagging makes equality and the repr-sort agree.
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(spark_df, oracle: str, con: duckdb.DuckDBPyConnection, name: str = "?") -> None:
    """Assert the Spark result and the DuckDB oracle result match.

    Oracle-gated queries must emit ATOMIC columns only: the external
    driver's canonicalizer sorts raw result columns with pandas, and a
    list/struct/map cell is unsortable there (``unhashable type:
    'list'`` — the r7 adjudication failure on q_inverted_index /
    q_matryoshka / q_postings_delta). Our local ``_norm_cell`` happily
    tuples lists, which is exactly why local parity GREEN + driver RED
    was possible; this guard makes the local gate as strict as the
    driver's. Array-shaped results should ship as comma-joined
    strings (integer-quantized for floats) on both engines.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    nonatomic = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nonatomic, (
        f"{name}: non-atomic output columns {nonatomic} — the driver's "
        "canonicalizer cannot sort list/struct cells; emit comma-joined "
        "strings instead"
    )
    sdf = spark_df.toPandas()
    odf = con.execute(oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"
    srows, orows = _canon(sdf), _canon(odf)
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(srows)} rows differ; first: "
        f"spark={mismatches[0][0]!r} oracle={mismatches[0][1]!r} (cols={sorted(sdf.columns)})"
    )
