"""Pandas UDAF definitions.

Deliberately NO ``from __future__ import annotations`` here: pandas_udf
infers GROUPED_AGG from the real (non-stringified) Series→scalar type
hints, which avoids the deprecated PandasUDFType enum.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def trimmed_mean(v: pd.Series) -> float:
    """10%-trimmed mean: drop the ⌊n/10⌋ smallest and largest, mean the
    rest (exact integer sum / count for integer-valued inputs)."""
    a = np.sort(v.to_numpy())
    k = len(a) // 10
    kept = a[k : len(a) - k]
    return float(kept.sum() / len(kept))


@pandas_udf("long")
def trimmed_count(v: pd.Series) -> int:
    return len(v) - 2 * (len(v) // 10)
