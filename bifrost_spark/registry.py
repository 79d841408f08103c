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
# registration order.  Round 7 window (VERDICT r6 item 1): the 17 round-2
# leftovers rolled from round 6 (oracle-checked ids first — q_fuzzy_join
# leads because its blocking key was rewritten this round; the rows-only
# dedup/sketch ids ALSO carry round-6 semantic changes to
# minhash_signatures' content-free filter, ADVICE r6 item 4), then any NEW
# round-7 operators (each new id lands in its own round's window), then the
# round-3 cohort, oracle ids first.  Rolled to round 8: the round-3
# TPC-H tail (q_tpch02–q_tpch21, displaced one-for-one as new round-7 ids
# were inserted above them), q_lm_score / q_gap_fill / q_percentile_cont /
# q_join_skew_salted / q_triangle_count (displaced by the second round-7
# batch), and the round-3 rows-only sketch ids (q_hll_rollup,
# q_decontaminate_fuzzy, q_theta_overlap, q_heavy_hitters,
# q_dedup_semantic, q_sim_ann_ivfpq).  ROUND-8 WINDOW PLAN: those ~31
# rolled ids first (oracle ids before rows-only), any new round-8 ids
# next, then the stalest round-4 standing rows to fill 50.
CHECK_PRIORITY: tuple[str, ...] = (
    # Round-2 leftovers: oracle-checked misc-relational/expression ids
    "q_fuzzy_join",
    "q_sql_api",
    "q_variant",
    "q_udaf_pandas",
    "q_collect_sorted",
    "q_token_count",
    "q_fingerprint",
    "q_pii_redact",
    "q_repetition",
    "q_sample_mixture",
    # Round-2 leftovers: rows-only sketch/media ids (q_dedup_minhash /
    # q_dedup_simhash re-prove the round-6 content-free signature filter)
    "q_agg_approx_quantile",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_sim_ann_ivf",
    "q_sim_ann_lsh",
    # NEW round-7 operators — every new id lands in its own round's window
    "q_dup_flow_matrix",
    "q_rerank_mmr",
    "q_centroid_drift",
    "q_quantile_sketch_rollup",
    "q_trimmed_mean",
    "q_fleiss_kappa",
    # NEW round-7 operators, second batch (eval_stats family)
    "q_mcnemar",
    "q_mann_whitney",
    "q_js_divergence",
    "q_chi2_keywords",
    "q_spearman_corr",
    "q_bh_fdr",
    "q_gini_users",
    "q_cochran_q",
    "q_cramers_v",
    # Round-3 cohort: analytics/pipeline oracle ids (most behavior-coupled
    # to ongoing work first), then TPC-H in query order
    "q_pipeline_e2e",
    "q_stratified_sample",
    "q_dataset_split",
    "q_dataset_split_grouped",
    "q_gopher_rules",
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
    "q_bloom_prune",
    "q_recursive_cte",
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
