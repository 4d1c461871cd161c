"""Cross-engine deterministic aggregation helpers.

The driver's t2 gate hash-compares Spark results against DuckDB
(BASELINE.md). Floating-point SUM/AVG are order-dependent, and Spark
(partial/final aggregation across partitions) will not sum doubles in
DuckDB's order. The fix used throughout this engine:

1. do per-row scalar arithmetic in DOUBLE (IEEE ops are deterministic
   per-row and identical across engines),
2. cast the per-row result to DECIMAL(20,6) — decimal addition is
   exact and associative, so partial aggregation order is irrelevant,
3. aggregate the decimals, cast the final result back to DOUBLE.

The SQL oracle mirrors the same casts, so both engines compute the
identical value regardless of parallelism — at sf0.01 for the gate and
unchanged at 100 TB on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for TPC-H-ish monetary values and event
#: metrics at any tested SF; 6 fractional digits >> data precision.
DEC = "decimal(20,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double expression, as double."""
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum ÷ exact count, in double.

    Matches the SQL oracle form
    ``CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) / COUNT(x)``.
    """
    col = F.col(col) if isinstance(col, str) else col
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """Oracle-side rendering of :func:`dsum` for a SQL scalar expression."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(20,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """Oracle-side rendering of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(20,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
