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


# ---------------------------------------------------------------------------
# Hashed-feature ("hashing trick") bucket derivation, engine-portable.
#
# md5 is the one content hash Spark and DuckDB share, so oracle-compared
# hashed-feature operators (DSIR, feature hashing, the quality classifier's
# no-oracle sibling uses xxhash64 instead) derive the bucket from leading
# md5 hex digits DECODED to 0-15 (the raw-ascii spelling collapsed mod 64:
# 256 ≡ 0 mod 64 — see MEMORY / round-3 fix).  The bucket count is a
# PARAMETER: fixtures use small counts (64) so tests can eyeball collision
# behavior, production runs want the paper-scale spaces (DSIR: Xie et al.
# 2023 use 10k; we default to the nearest power of two, 8192, which keeps
# the digit prefix exactly uniform).  16^d is 2^(4d), so any power-of-two
# bucket count divides some hex-prefix space evenly → zero bucket-size bias.
# ---------------------------------------------------------------------------

#: Production-scale default for hashed bag-of-words feature spaces.
HASH_BUCKETS_PROD = 8192


def _hash_digits(n_buckets: int) -> int:
    """Smallest hex-digit count whose value space is a multiple of
    ``n_buckets`` (uniformity) — requires a power-of-two count ≤ 16^8."""
    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    d = (n_buckets.bit_length() - 1 + 3) // 4  # ceil(log16(n_buckets))
    if d > 8:
        raise ValueError(f"n_buckets too large: {n_buckets}")
    return max(d, 1)


def hash_bucket(col: Column | str, n_buckets: int) -> Column:
    """``bucket ∈ [0, n_buckets)`` from the leading md5 hex digits of a
    string column — identical value on any engine that has md5."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c)
    val = F.lit(0)
    for i in range(1, _hash_digits(n_buckets) + 1):
        a = F.ascii(F.substring(h, i, 1))
        digit = F.when(a >= 97, a - 87).otherwise(a - 48)
        val = val * 16 + digit
    return (val % n_buckets).cast("int")


def sql_md5_digit(expr: str, i: int) -> str:
    """DuckDB: the i-th md5 hex digit of expr DECODED to 0-15 (the
    raw-ascii spelling collapses mod small powers — the round-3 mod-64
    fix).  The single shared decode idiom: every md5-digit consumer
    (bucketing here, the bootstrap uniforms in curation_ops) must build
    on this so a decode fix can never miss a copy."""
    return (
        f"(CASE WHEN ascii(substr(md5({expr}), {i}, 1)) >= 97 "
        f"THEN ascii(substr(md5({expr}), {i}, 1)) - 87 "
        f"ELSE ascii(substr(md5({expr}), {i}, 1)) - 48 END)"
    )


def sql_hash_bucket(expr: str, n_buckets: int) -> str:
    """DuckDB SQL mirror of :func:`hash_bucket` (same digits, same math)."""
    digits = _hash_digits(n_buckets)
    val = "0"
    for i in range(1, digits + 1):
        val = f"(({val}) * 16 + {sql_md5_digit(expr, i)})"
    return f"CAST(({val}) % {n_buckets} AS INT)"


# Re-exported for the query layer; the implementation (and the r12
# partition-count gate that keeps it scale-safe) lives with the operators.
from bifrost_spark.operators.partitioning import spread  # noqa: E402,F401
