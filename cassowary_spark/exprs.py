"""Cross-engine-stable expression helpers.

``srnd`` replaces round() in every oracle-checked float output:
Spark's round() re-rounds the shortest-decimal representation
(BigDecimal HALF_UP) while DuckDB rounds the scaled binary value, so
values sitting exactly on a decimal boundary — common when inputs are
decimal-quantized like discounts/taxes — round differently. The
floor(x·10ⁿ + 0.5)/10ⁿ form is the same IEEE op sequence in both
engines, so identical inputs give bit-identical outputs. The oracle
SQL spells the same formula inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def srnd(col: Column | str, n: int = 4) -> Column:
    """Stable half-up rounding to n decimals (see module docstring)."""
    if isinstance(col, str):
        col = F.col(col)
    s = F.lit(float(10**n))
    return F.floor(col * s + F.lit(0.5)) / s


def sql_srnd(expr: str, n: int = 4) -> str:
    """The DuckDB-side spelling of ``srnd`` for oracle strings."""
    s = f"{float(10 ** n):.1f}"
    return f"floor(({expr}) * {s} + 0.5) / {s}"
