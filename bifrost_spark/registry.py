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
# ROUND-9 WINDOW (VERDICT r8 item 1): the round-4 cohort — the 45 ids
# whose standing driver rows date from round 4 (the relational core,
# q_tpch22, the dsir ids, the web-dedup family, …) — PLUS every new
# round-9 id (a new id must land in its own round's window).  With 14
# round-9 additions only 36 of the 45 round-4 ids fit; the 9 deferred to
# round 10 are the tail below the oracle core: q_zscore, q_feature_hash,
# q_profile, q_zorder, q_percent_of_total, q_lateral_topn, q_copurchase,
# q_dsir_weights_hires, and rows-only q_sim_ann_opq.
# ROUND-10 WINDOW PLAN: those 9 deferred round-4 ids first, then new
# round-10 ids, then the stalest round-5 rows (the whole round-5 cohort
# of 50 — q_agg_stats … q_window_range_frame — becomes the backlog) to
# fill 50.
CHECK_PRIORITY: tuple[str, ...] = (
    # Round-4 cohort: relational core (oracle ids)
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_multiway",
    "q_agg_hash",
    "q_agg_distinct",
    "q_rollup",
    "q_cube",
    "q_window_rank",
    "q_window_running",
    "q_sort_limit",
    "q_set_ops",
    "q_scalar_funcs",
    "q_json_extract",
    "q_array_ops",
    # Round-4 cohort: LLM-pipeline + analytics oracle ids
    "q_dedup_exact",
    "q_sim_topk",
    "q_text_stats",
    "q_tpch22",
    "q_dsir_weights",
    "q_dsir_resample",
    "q_bm25",
    "q_snapshot_diff",
    "q_url_dedup",
    "q_dedup_paragraph",
    "q_dedup_incremental",
    "q_hard_negatives",
    "q_quality_classifier",
    "q_lm_bigram",
    "q_join_asof_tol",
    "q_rolling_median",
    "q_time_weighted_avg",
    "q_bitwise_agg",
    "q_sliding_window",
    "q_map_ops",
    "q_integrity_check",
    # NEW round-9 operators (each new id lands in its own round's
    # window): the distributional/trend test family, the
    # experimentation-design family, and the tokenizer/corpus-statistics
    # family (VERDICT r8 item 3)
    "q_cramer_von_mises",
    "q_anderson_darling",
    "q_mood_median",
    "q_runs_test",
    "q_mann_kendall",
    "q_group_sequential",
    "q_mantel_haenszel",
    "q_permutation_test",
    "q_page_hinkley",
    "q_bpe_merges",
    "q_ngram_novelty",
    "q_zipf_fit",
    "q_chao1_vocab",
    "q_good_turing",
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
