"""Coarse-quantizer cell assignment for the ANN / SemDeDup operators.

One dispatcher, two spellings:

* **literal path** (k ≤ ``LITERAL_K_MAX``): the k trained centroids are
  embedded as plan-time literal arrays and assignment is k JVM-side
  dot-product folds per row, fully inside whole-stage codegen — zero
  Python, zero broadcast state.  Plan size grows O(k·d) expression
  nodes, which is why this path is capped.
* **pandas path** (k > ``LITERAL_K_MAX``): the centroids travel to the
  executors ONCE inside the UDF closure as a single numpy (k, d)
  matrix; each Arrow batch is scored with one BLAS matmul
  (batch × k) and top-``nprobe`` cells come from an argpartition.
  The plan holds ONE expression node regardless of k — the
  production-k spelling (the shape of FAISS's own IVF assignment
  kernel), for coarse quantizers in the 4k–64k cell range.

Both paths rank cells by dot product against the given column (unit
vectors → cosine order) and break exact ties toward the LOWER cell id,
so swapping paths at the threshold never changes an assignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from bifrost_spark.operators.vectors import dot_fast

LITERAL_K_MAX = 64


def _rank_cells_literal(col: Column, centers: list[list[float]], nprobe: int) -> Column:
    ranked = F.sort_array(
        F.array(
            *[
                F.struct(
                    (-dot_fast(col, F.array(*[F.lit(v) for v in c]))).alias("negd"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(centers)
            ]
        )
    )
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s.cell)


def _rank_cells_pandas(centers: list[list[float]], nprobe: int):
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centers, dtype=np.float64)  # (k, d)
    k = len(C)
    n_take = min(nprobe, k)

    @pandas_udf(ArrayType(IntegerType()))
    def rank(vec: pd.Series) -> pd.Series:
        U = np.vstack(vec.to_numpy()).astype(np.float64)  # (b, d)
        scores = U @ C.T  # one BLAS matmul per Arrow batch
        if n_take == 1:
            # argmax returns the FIRST max → lower cell id wins ties,
            # matching the literal path's struct sort
            best = np.argmax(scores, axis=1)[:, None]
        else:
            part = np.argpartition(-scores, n_take - 1, axis=1)[:, :n_take]
            rows = np.arange(len(U))[:, None]
            sel = part[
                rows, np.argsort(part, axis=1, kind="stable")
            ]  # cell-id ascending ...
            # ... then stable sort on -score: exact ties keep the lower
            # cell id first, matching the literal path's struct sort
            order = np.argsort(-scores[rows, sel], axis=1, kind="stable")
            best = sel[rows, order]
        return pd.Series([r.astype(np.int32) for r in best])

    return rank


def rank_cells(
    col: Column, centers: list[list[float]], nprobe: int = 1
) -> Column:
    """array<int> of the ``nprobe`` nearest cell ids for ``col`` (an
    array<numeric> vector column), best first.  Dispatches on k: literal
    folds under ``LITERAL_K_MAX``, one Arrow-batched BLAS matmul above."""
    if len(centers) <= LITERAL_K_MAX:
        return _rank_cells_literal(col, centers, nprobe)
    return _rank_cells_pandas(centers, nprobe)(col)


def assign_cell(col: Column, centers: list[list[float]]) -> Column:
    """The single nearest cell id (int) for ``col``."""
    return F.element_at(rank_cells(col, centers, 1), 1)
