"""Shared helpers for oracle-deterministic query outputs.

Floating-point SUM/AVG are order-dependent; Spark's partial aggregation and
DuckDB's vectorized aggregation visit rows in different orders, so raw
``SUM(double)`` can differ in the last ulp and break a value-hash compare.
Fix: accumulate in DECIMAL (exact, order-independent), then cast the final
scalar back to DOUBLE.  Both engines perform the identical double→decimal
rounding per row (round-to-nearest; exact decimal ties are unrepresentable in
binary doubles, so the rounding mode never matters) and the decimal sum is
exact, making the result bit-stable across engines and partition counts —
which also makes it stable across a 1000-executor re-partitioning at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits total / 6 fractional is enough for sf0.1 fixture magnitudes with
# lots of headroom (sum of 6e5 values < 1e6 each → < 1e12 integral digits).
DEC = "decimal(28,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM over doubles: sum in decimal, emit double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum → double, / count.

    Single double division of two exact values — deterministic in both
    engines (IEEE 754).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
