"""Embedding-vector operators: deterministic cosine, brute-force top-k,
sign-random-projection LSH (ANN scale path).

Determinism: float components widen exactly to double; per-term products are
IEEE-exact; each term is rounded once to DECIMAL(22,18) (identically in both
engines) and the SUM over those decimals is exact, so the fold order (Spark's
higher-order ``aggregate`` vs DuckDB's UNNEST aggregation) cannot change the
result.  sqrt/division on the exact sums are single IEEE ops → cosine is
bit-identical across engines and partitionings.

DECIMAL(22,18) is chosen so Spark's decimal-addition type promotion
((22,18)+(22,18) → (23,18)) never clamps the scale — the explicit cast back
to (22,18) inside the fold is value-exact for |sum| < 10^4, which bounds all
dot/norm sums over unit-ish 64-dim embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(22,18)"
SQL_DEC = "DECIMAL(22,18)"  # oracle-side twin


def _dec_fold_sum(terms: Column) -> Column:
    """Exact sum of an array<double> via decimal accumulation → double."""
    return F.aggregate(
        terms,
        F.lit(0).cast(_DEC),
        lambda acc, x: (acc + x.cast(_DEC)).cast(_DEC),
    ).cast("double")


def dot(a: Column, b: Column) -> Column:
    """Deterministic dot product of two array<float>/array<double> columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _dec_fold_sum(prods)


def norm2(a: Column) -> Column:
    """Deterministic squared L2 norm."""
    return _dec_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    """Deterministic cosine similarity."""
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def with_norm(df: DataFrame, vec_col: str, out: str = "nrm2") -> DataFrame:
    return df.withColumn(out, norm2(F.col(vec_col)))


def srp_bucket(vec: Column, dim: int, n_bits: int = 16, seed: int = 42) -> Column:
    """Sign-random-projection LSH bucket id (bigint).

    Projection matrix entries are deterministic pseudo-randoms derived from
    (seed, bit, component) via xxhash64 → mapped to ±1 — reproducible on any
    cluster with zero broadcast state.  bucket bit b = sign(Σ_i ±v_i).
    """
    bucket = F.lit(0).cast("bigint")
    for bit in range(n_bits):
        signed = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: F.when(
                    F.xxhash64(F.lit(seed), F.lit(bit), i).bitwiseAND(F.lit(1)) == 1,
                    x.cast("double"),
                ).otherwise(-x.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(signed > 0, F.shiftleft(F.lit(1).cast("bigint"), bit)).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket
