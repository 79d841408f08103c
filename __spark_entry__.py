"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``bifrost_spark.registry``: every operator registers its Spark
implementation and DuckDB oracle in one place (see bifrost_spark/queries/*),
and this module just exposes the dicts the driver expects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bifrost_spark import registry
from bifrost_spark.session import tune_for_oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped q_agg_hash) on /root/testdata/sf0.001."""
    tune_for_oracle(spark)
    return registry.queries()["q_agg_hash"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query id; randomized/streaming ops are omitted
    (rows-only check)."""
    return registry.oracles()
