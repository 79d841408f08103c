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
# registration order.  Round 2 window = every query without a round-1
# CORRECTNESS row (SURVEY §2 parity ids + the LLM/multimodal families) plus
# re-checks of the two queries whose array-typed output crashed the round-1
# canonicalizer (now scalarized).  Round-1 greens (relational core + ext)
# keep their standing rows and rotate to the back.
CHECK_PRIORITY: tuple[str, ...] = (
    # SURVEY §2 declared ids with no round-1 driver row: parity family
    "q_topic_discovery",
    "q_topic_filter",
    "q_partition_demux",
    "q_offset_bounds",
    "q_tumbling_window",
    "q_session_window",
    "q_object_keys",
    "q_commit_offsets",
    # LLM dedup family
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_dedup_cluster",
    # LLM similarity family
    "q_sim_topk",
    "q_embedding_norm",
    "q_embedding_quant",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_knn_eval",
    # LLM text family
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_quality_score",
    "q_sample_mixture",
    "q_fingerprint",
    "q_tfidf",
    "q_repetition",
    "q_chunking",
    "q_pii_redact",
    "q_pack_sequences",
    "q_decontaminate",
    "q_entropy",
    # Multimodal family
    "q_multimodal_meta",
    "q_multimodal_resize",
    "q_multimodal_frames",
    "q_multimodal_features",
    "q_multimodal_dedup",
    "q_multimodal_pair",
    # Round-1 canonicalizer crashes, outputs now scalarized — re-check
    "q_collect_sorted",
    "q_agg_approx_quantile",
    # Remaining slots: this round's flagship additions (decode round-trip,
    # span dedup, corpus cleaning) + API-surface representatives rotated
    # in from the round-1 addendum
    "q_multimodal_decode",
    "q_dup_spans",
    "q_domain_cap",
    "q_ccnet_bucket",
    "q_mixture_weights",
    "q_fuzzy_join",
    "q_variant",
    "q_udaf_pandas",
    "q_sql_api",
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
