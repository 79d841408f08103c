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


def dot_fast(a: Column, b: Column) -> Column:
    """Double-accumulation dot product — the cheap prefilter path.

    ~10× faster than the decimal fold (no per-term decimal round-trips).
    Within one row the array fold order is fixed, so the value is still
    deterministic across partitionings; it differs from the exact decimal
    dot by at most ~dim ulps (< 1e-12 relative for 64-dim unit-ish vectors).
    Use with a threshold margin, then rescore survivors with ``cosine``.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2_fast(a: Column) -> Column:
    """Double-accumulation squared L2 norm (prefilter twin of ``norm2``)."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str, out: str = "nrm2") -> DataFrame:
    return df.withColumn(out, norm2(F.col(vec_col)))


def scale_by(vec: Column, divisor: Column, round_dp: int | None = None) -> Column:
    """Element-wise ``vec / divisor`` with the divisor evaluated ONCE per row.

    NEVER write ``F.transform(vec, lambda x: x / divisor_expr)`` when the
    divisor is a computed expression (a norm fold, an aggregate, even a
    projected alias of one): Catalyst's CollapseProject inlines the alias
    into the lambda BODY, where higher-order functions re-evaluate it per
    ELEMENT — the O(d)-per-row normalization silently becomes O(d²)
    (measured: 11 s instead of <1 s on 2000 rows × 64 dims at sf0.1,
    because the interpreted decimal/double fold ran 64× per row).

    Zipping against ``array_repeat(divisor, size(vec))`` pins the divisor
    in zip_with's ARGUMENT position — arguments are evaluated once per row,
    only the lambda body runs per element — so the shape stays O(d)/row no
    matter where CollapseProject moves it.  Same defense class as the
    Generate-filter recompute: make the expensive expression structurally
    un-inlinable instead of hoping the optimizer keeps the projection.
    """
    per_elem = (
        (lambda x, n: F.round(x.cast("double") / n, round_dp))
        if round_dp is not None
        else (lambda x, n: x.cast("double") / n)
    )
    return F.zip_with(
        vec, F.array_repeat(divisor.cast("double"), F.size(vec)), per_elem
    )


def _sql_double(v: float) -> str:
    """Shortest-exact SQL double literal (Double.parseDouble round-trips
    repr() bit-exactly; verified incl. exponents and -0.0)."""
    f = float(v)
    if f != f or f in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal {v!r} in plan constant")
    return f"{f!r}D"


def lit_vector(row: list[float]) -> Column:
    """array<double> literal built as ONE parsed SQL expression.

    ``F.array(*[F.lit(v) for v in row])`` costs one py4j round-trip per
    element — building the IVF-PQ codebook tables this way spent ~13 s of
    pure plan construction (48k gateway calls) per query at k·d ≈ 2k
    literals.  One F.expr string is one round-trip regardless of size."""
    return F.expr("array(" + ",".join(_sql_double(v) for v in row) + ")")


def lit_bigint_vector(row: list[int]) -> Column:
    """array<bigint> literal as ONE parsed SQL expression (see lit_vector)."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in row) + ")")


def sql_matrix(rows: list[list[float]]) -> str:
    """The SQL-string body of :func:`lit_matrix` — for embedding a literal
    matrix inside a LARGER single-parse expression (r12: the IVF-PQ
    encode/ADC trees are built as one SQL string each; splicing the
    codebook literals in keeps the whole tree at one py4j round-trip)."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(v) for v in r) + ")" for r in rows
        )
        + ")"
    )


def lit_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> literal as ONE parsed SQL expression (see
    lit_vector for why)."""
    return F.expr(sql_matrix(rows))


def sql_dot_fast(a: str, b: str) -> str:
    """SQL-string twin of :func:`dot_fast` — identical expression tree
    (the CASTs and the 0.0D seed match the Column spelling), for use
    inside single-parse composite expressions."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE)"
        f" * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def sql_struct_table(
    rows: list[list[float]], id_field: str, vec_field: str
) -> str:
    """SQL-string body of :func:`lit_struct_table` (see sql_matrix)."""
    return (
        "array("
        + ",".join(
            f"named_struct('{id_field}', {i}, '{vec_field}', array("
            + ",".join(_sql_double(v) for v in r)
            + "))"
            for i, r in enumerate(rows)
        )
        + ")"
    )


def lit_struct_table(
    rows: list[list[float]], id_field: str, vec_field: str
) -> Column:
    """array<struct<id_field int, vec_field array<double>>> literal — the
    (id, centroid) lookup table shape consumed by transform-based argmin
    scans — as ONE parsed SQL expression (see lit_vector for why)."""
    return F.expr(sql_struct_table(rows, id_field, vec_field))


def cosine_pair_candidates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    margin: float = 1e-6,
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """All-pairs cosine candidates ≥ threshold−margin via numpy matmul.

    The corpus is broadcast once (ids + row-normalized float64 matrix — the
    same "fits-in-broadcast" gate as a broadcast hash join's build side) and
    each Arrow batch of the scan is matrix-multiplied against it — BLAS does
    |batch|×|corpus| dot products per call, ~100× faster than per-pair
    expression folds.  Emits (id_a, id_b) with id_a < id_b, exactly once.

    Above the broadcast gate this operator refuses (raises) — the 100 TB
    path is LSH bucketing (srp_bucket / lsh_candidate_pairs), where the
    same numpy scoring runs per bucket.
    """
    import numpy as np

    rows = df.select(id_col, vec_col).limit(max_broadcast_rows + 1).collect()
    if len(rows) > max_broadcast_rows:
        raise ValueError(
            f"corpus exceeds broadcast gate {max_broadcast_rows}; "
            "use the LSH-bucketed path for all-pairs at this scale"
        )
    if not rows:  # empty corpus: a 0-row np.array is 1-D and axis=1 breaks
        return df.sparkSession.createDataFrame([], "id_a long, id_b long")
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast((ids, mat))

    def gen(batches):
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            if pdf.empty:  # np.stack needs at least one array
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            sims = v @ b_mat.T  # |batch| × |corpus|
            my_ids = pdf[id_col].to_numpy().astype(np.int64)
            ii, jj = np.nonzero(sims >= threshold - margin)
            a, b = my_ids[ii], b_ids[jj]
            keep = a < b
            yield pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    return df.select(id_col, vec_col).mapInPandas(gen, schema="id_a long, id_b long")


def _srp_signs(seed: int, bit: int, dim: int) -> list[float]:
    """Deterministic ±1 sign vector for one projection bit.

    Derived from sha256(seed, bit, i) driver-side — plan-time constants, so
    executors never hash: the projection is a plain literal-array dot product
    (zero broadcast state, reproducible on any cluster)."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.sha256(f"{seed}:{bit}:{i}".encode()).digest()
        out.append(1.0 if h[0] & 1 else -1.0)
    return out


def srp_bucket(vec: Column, dim: int, n_bits: int = 16, seed: int = 42) -> Column:
    """Sign-random-projection LSH bucket id (bigint).

    bucket bit b = sign(vec · signs_b) where signs_b is a deterministic ±1
    literal array (see ``_srp_signs``).  Per row: n_bits double-fold dot
    products over the vector — no per-row hashing at all.

    The n_bits × dim sign matrix is ONE parsed literal (lit_matrix) and
    the per-bit terms come from an index-aware transform over it — the
    per-element F.lit() spelling cost n_bits·dim py4j round-trips of plan
    construction per query.  Same bucket value: Σ (1 << b) over positive
    projections.
    """
    signs_tab = lit_matrix([_srp_signs(seed, bit, dim) for bit in range(n_bits)])
    terms = F.transform(
        signs_tab,
        lambda s, i: F.when(
            dot_fast(vec, s) > 0,
            # call_function: the PySpark shiftleft wrapper only takes a
            # Python int for numBits; the SQL function accepts a column
            F.call_function("shiftleft", F.lit(1).cast("bigint"), i),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(
        terms, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
