"""Data-layout operators: Z-order (Morton) keys for multi-dimensional
clustering.

Sorting a table by a single column clusters row groups for ONE predicate
dimension; interleaving the bits of several columns (the Z-order curve)
gives every participating dimension locality, so parquet min/max row-group
stats prune for ANY of them — the OPTIMIZE ZORDER BY feature of lakehouse
table formats, expressed as a plain sort key the engine computes JVM-side.

Pure integer bit arithmetic (shiftleft/or) → deterministic everywhere and
oracle-checkable; typical use is
``df.repartitionByRange("zkey").sortWithinPartitions("zkey").write...``
so each output file covers a compact hyper-rectangle of the key space.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integral)
    column into one Morton key: output bit (i·n_cols + j) = bit i of
    cols[j].  Columns must be pre-scaled to [0, 2^bits) — use pmod / a
    bucketized rank for arbitrary domains."""
    n = len(cols)
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cb = c.cast("bigint")
        for i in range(bits):
            bit = F.shiftright(cb, i).bitwiseAND(F.lit(1).cast("bigint"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key
