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

# The external correctness gate samples the FIRST 50 entries of ``queries()``
# in iteration order, so ordering is part of the driver contract.  Queries
# named here are yielded first (in this order); everything else follows in
# registration order.  Round 3 window = the ids still without any driver
# CORRECTNESS row after rounds 1-2: the full TPC-H suite, the analytics
# family, scale_ops, q_dedup_semantic / q_sim_ann_ivfpq / q_gopher_rules,
# and two relational_ext2 ids.  The 11 remaining relational_ext2 ids
# (q_bitwise_agg q_sliding_window q_map_ops q_integrity_check q_zscore
# q_feature_hash q_profile q_zorder q_percent_of_total q_lateral_topn
# q_copurchase) rotate in for round 4.  Rounds-1/2 greens keep their
# standing rows and rotate to the back.
CHECK_PRIORITY: tuple[str, ...] = (
    # Full TPC-H decision-support suite (Q1 ≡ q_agg_hash, already green r1)
    "q_tpch02",
    "q_tpch03",
    "q_tpch04",
    "q_tpch05",
    "q_tpch06",
    "q_tpch07",
    "q_tpch08",
    "q_tpch09",
    "q_tpch10",
    "q_tpch11",
    "q_tpch12",
    "q_tpch13",
    "q_tpch14",
    "q_tpch15",
    "q_tpch16",
    "q_tpch17",
    "q_tpch18",
    "q_tpch19",
    "q_tpch20",
    "q_tpch21",
    "q_tpch22",
    # Analytics family (flagship q_ewma last-verified locally only)
    "q_ewma",
    "q_funnel",
    "q_cohort_retention",
    "q_scd2",
    "q_merge_upsert",
    "q_running_distinct",
    "q_interval_merge",
    "q_seq_pattern",
    "q_pagerank",
    "q_outlier_iqr",
    "q_ab_test",
    # scale_ops family
    "q_bloom_prune",
    "q_recursive_cte",
    "q_join_skew_salted",
    "q_hll_rollup",
    "q_dataset_split",
    "q_dataset_split_grouped",
    "q_stratified_sample",
    "q_pipeline_e2e",
    "q_decontaminate_fuzzy",
    "q_triangle_count",
    "q_lm_score",
    "q_theta_overlap",
    "q_heavy_hitters",
    # Remaining family stragglers
    "q_dedup_semantic",
    "q_sim_ann_ivfpq",
    "q_gopher_rules",
    # Two relational_ext2 ids (rest queued for round 4)
    "q_gap_fill",
    "q_percentile_cont",
)


def _ordered() -> list[str]:
    _ensure_loaded()
    prioritized = [n for n in CHECK_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in CHECK_PRIORITY]
    return prioritized + rest


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
    return {name: REGISTRY[name].fn for name in _ordered()}


def oracles() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }


def _ensure_loaded() -> None:
    # Import side-effect registers every query module exactly once.
    import bifrost_spark.queries  # noqa: F401
