"""Query registry — the single source of truth behind __spark_entry__.py.

Every operator the engine claims (SURVEY.md §2) registers here with:
  * a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
  * optionally a DuckDB oracle SQL string (ANSI, over the pre-registered
    fixture views) — omitted only for genuinely non-SQL-expressible ops
    (randomized LSH, streaming), which the driver checks rows-only.

The decorator wraps each query so the externally-provided session gets the
deterministic-comparison confs (UTC tz, AQE) before the plan is built.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from bifrost_spark.session import tune_for_oracle

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register an engine query.  ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def _ensure_loaded() -> None:
    # Import side-effect registers every query module exactly once.
    import bifrost_spark.queries  # noqa: F401
