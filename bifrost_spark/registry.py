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
# registration order.  Round 8 window (VERDICT r7 item 1): the 31 ids whose
# standing rows date from round 3 — the TPC-H tail q_tpch02..q_tpch21,
# q_join_skew_salted / q_triangle_count / q_lm_score / q_gap_fill /
# q_percentile_cont, and the round-3 rows-only sketch ids — oracle ids
# before rows-only, then any NEW round-8 ids (each new id lands in its own
# round's window), then the stalest round-4 standing rows to fill 50.
# Rolled to round 9: the remaining round-4 cohort (relational core beyond
# the fills below, the dedup/web family, q_tpch22 and the dsir ids).
# ROUND-9 WINDOW PLAN: after this round's driver run the stalest standing
# rows are the 45 round-4 ids not in the fills — q_join_left/semi/anti/
# multiway, q_agg_hash/distinct, q_rollup/q_cube, the window/sort/set/
# scalar/json/array relational core, q_dedup_exact, q_sim_topk,
# q_text_stats, q_tpch22, the dsir trio, q_bm25, q_snapshot_diff, the
# web-dedup family (q_url_dedup, q_dedup_paragraph, q_dedup_incremental),
# q_hard_negatives, q_sim_ann_opq, q_quality_classifier, q_lm_bigram,
# q_join_asof_tol, q_rolling_median, q_time_weighted_avg, q_bitwise_agg,
# q_sliding_window, q_map_ops, q_integrity_check, q_zscore,
# q_feature_hash, q_profile, q_zorder, q_percent_of_total,
# q_lateral_topn, q_copurchase, q_dsir_weights_hires — those first
# (oracle ids before rows-only q_sim_ann_opq), then new round-9 ids,
# then stalest round-5 rows to fill 50.
CHECK_PRIORITY: tuple[str, ...] = (
    # Round-3 rolled cohort, oracle ids first: the TPC-H tail in query
    # order (standing rows date from round 3)
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
    # Round-3 rolled cohort: remaining oracle ids
    "q_join_skew_salted",
    "q_triangle_count",
    "q_lm_score",
    "q_gap_fill",
    "q_percentile_cont",
    # Round-3 rolled cohort: rows-only sketch ids (local accuracy gates
    # stand in for the hash check — recall/precision/rank-error)
    "q_hll_rollup",
    "q_decontaminate_fuzzy",
    "q_theta_overlap",
    "q_heavy_hitters",
    "q_dedup_semantic",
    "q_sim_ann_ivfpq",
    # NEW round-8 operators (each new id lands in its own round's window):
    # the robust/nonparametric statistics family, the sequential
    # monitoring family, and the two dedup/drift shapes from VERDICT r7
    # item 4
    "q_anova_f",
    "q_cohens_d",
    "q_kruskal_wallis",
    "q_wilcoxon_signed_rank",
    "q_kendall_tau",
    "q_brown_forsythe",
    "q_friedman_test",
    "q_mad_outliers",
    "q_sprt_monitor",
    "q_cusum_drift",
    "q_jackknife_variance",
    "q_woe_iv",
    "q_contamination_drift",
    "q_dup_span_ladder",
    "q_sketch_drift",
    # Round-4 staleness fills (stalest standing rows, registration order)
    "q_scan_events",
    "q_filter_pushdown",
    "q_project_expr",
    "q_join_inner",
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
