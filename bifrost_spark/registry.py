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
# registration order.  Round 6 window (VERDICT r5 item 1): after round 5
# the driver-unchecked backlog is zero, so this window is pure staleness
# rotation plus any round-6 additions.  Contents: the six ids standing on
# round-1 rows never re-checked since round 1 (q_agg_approx is rows-only by
# policy; the other five are oracle-checked scalar-function ids), any NEW
# round-6 operators (each new id must land in its own round's window so the
# unchecked backlog never re-grows), then the stalest round-2 standing rows
# (oracle-checked ids first — rows-only re-verification is weaker evidence).
# Deferred to round 7: the remaining round-2 cohort, then round 3.
CHECK_PRIORITY: tuple[str, ...] = (
    # Round-1 rows, never re-checked since round 1
    "q_agg_approx",
    "q_string_agg",
    "q_date_arith",
    "q_regex_extract",
    "q_null_semantics",
    "q_min_max_by",
    # NEW round-6 operators (curation_ops.py + the incremental-minhash
    # twin) — every new id lands in its own round's window
    "q_rerank_cross",
    "q_contamination_report",
    "q_embedding_centroid",
    "q_ctr_wilson",
    "q_hapax_report",
    "q_freq_spectrum",
    "q_calibration_bins",
    "q_kappa_agreement",
    "q_dedup_prefix",
    "q_dedup_incremental_minhash",
    "q_embedding_outliers",
    "q_ndcg_eval",
    "q_containment",
    "q_bootstrap_ci",
    # Round-2 standing rows — streaming/parity analogs (reference operators)
    "q_topic_discovery",
    "q_topic_filter",
    "q_partition_demux",
    "q_offset_bounds",
    "q_tumbling_window",
    "q_session_window",
    "q_object_keys",
    "q_commit_offsets",
    # Round-2 dedup/similarity cohort (heavily rewritten by round-5 perf work)
    "q_dedup_ngram_jaccard",
    "q_dedup_embedding",
    "q_dedup_cluster",
    "q_embedding_norm",
    "q_embedding_quant",
    "q_knn_eval",
    "q_dup_spans",
    # Round-2 text/cleaning cohort
    "q_lang_id",
    "q_quality_score",
    "q_tfidf",
    "q_chunking",
    "q_pack_sequences",
    "q_decontaminate",
    "q_entropy",
    "q_domain_cap",
    "q_ccnet_bucket",
    "q_mixture_weights",
    # Round-2 multimodal cohort (decode kernels touched by round-5 hardening)
    "q_multimodal_meta",
    "q_multimodal_frames",
    "q_multimodal_dedup",
    "q_multimodal_pair",
    "q_multimodal_decode",
    # Rolled to round 7 by the 14 new round-6 ids: the untouched-since-r2
    # misc-relational/regex/expression oracle ids (q_fuzzy_join, q_variant,
    # q_udaf_pandas, q_sql_api, q_collect_sorted, q_sample_mixture,
    # q_fingerprint, q_pii_redact, q_repetition, q_token_count) and the
    # round-2 rows-only cohort
    # (q_dedup_minhash, q_dedup_simhash, q_sim_ann_lsh, q_sim_ann_ivf,
    # q_multimodal_resize/features, q_agg_approx_quantile — weaker
    # rows-only evidence, lowest priority).
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
