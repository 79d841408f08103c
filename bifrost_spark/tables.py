"""Fixture table loaders (schemas: /root/repo/FIXTURES.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``.  Loading is a
plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown + column
pruning; no caching here — queries decide what (if anything) to persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at EVERY scale factor the engine
# targets (region/nation are bounded by geography, not SF).
BROADCASTABLE = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts as int64 nanos (spark.sql.legacy.parquet.nanosAsLong, session.py);
        # integer `div` keeps full precision (ns epoch exceeds double's 2^53)
        # and floors to µs exactly like DuckDB's ns→µs read.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Parquet timestamps without isAdjustedToUTC surface as TIMESTAMP_NTZ on
    # Spark 4; with the session TZ pinned to UTC (session.py) the cast to
    # session-TZ TIMESTAMP is wall-clock-preserving and keeps every query /
    # oracle comparison on the single timestamp type they were written for.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
