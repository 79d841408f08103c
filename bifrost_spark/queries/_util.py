"""Shared helpers for oracle-deterministic query outputs.

Floating-point SUM/AVG are order-dependent; Spark's partial aggregation and
DuckDB's vectorized aggregation visit rows in different orders, so raw
``SUM(double)`` can differ in the last ulp and break a value-hash compare.
Fix: accumulate in DECIMAL (exact, order-independent), then cast the final
scalar back to DOUBLE.  The decimal sum is exact, so the result is
bit-stable across partition counts and task retries — which also makes it
stable across a 1000-executor re-partitioning at 100 TB.

Cross-engine contract (measured, pinned by
tests/test_properties.py::test_dsum_equals_exact_decimal_model): the
per-row double→decimal cast is NOT engine-identical in general.  Spark
casts via ``BigDecimal.valueOf`` — the double's SHORTEST decimal repr
(same digits as Python ``repr``) rounded HALF_UP at the target scale —
while DuckDB's cast rounds differently on such values (e.g. for
536870912.6183465 the shortest repr HALF_UP-rounds to …618347 but DuckDB
emits …618346).  The rounding decisions agree whenever the TRUE value of
the double has ≤6 fractional decimal digits (then the scale-6 cast is a
near-exact quantization with no tie to break, for any rounding mode).
Every dsum/davg input in this engine satisfies that: fixture money columns
are 2-dp decimals, and derived inputs are products/quotients of integers
and 2-dp values by powers of ten (≤5 fractional digits).  Do NOT feed
dsum with deep-fraction doubles (sqrt/log/division results) in an
oracle-compared query — round such values first or compare ranks/ids.
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
