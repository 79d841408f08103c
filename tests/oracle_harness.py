"""Local replica of the driver's DuckDB-oracle comparison (best-effort):
row count + column names/order-insensitive schema + order-insensitive value
comparison, with Spark results and DuckDB results both normalized through
pandas.  Used by tests/test_oracle_parity.py at sf0.001 so every registered
query is gate-checked before the driver ever runs it at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from bifrost_spark.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # µs precision strings, tz-dropped — both engines are UTC-naive here
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(int(v)))
        else:
            out[c] = s.map(lambda v: "NULL" if v is None else str(v))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"column mismatch: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = _normalize(spdf), _normalize(oracle_pdf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = neq[neq].index[:5]
        for i in idx:
            problems.append(f"row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
        if not len(idx):
            problems.append("frames differ (dtype-level)")
    return problems
