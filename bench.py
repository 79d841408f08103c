#!/usr/bin/env python
"""Benchmark runner (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Timing is end-to-end per query: plan build + execution, consumed through
the noop sink (guide §1.4) so every column of every row materializes
without a driver collect.

r12 measurement fix (per the r11 verdict): the clock now starts BEFORE the
query constructor runs, so driver-side build work — eager localCheckpoints,
sample collects, k-means/OPQ fits — is inside the timed region, matching
this docstring's long-standing "plan build + execution" promise.  Through
r11 the clock started after the constructor returned, which hid roughly
half the engine's real cost (SWEEP_r11: 87.4 s build vs 76.7 s exec across
all 273 ids).  Expect r12 numbers to be HIGHER than r11's for build-heavy
ids — the clock got honest, the engine got faster (old-protocol numbers
are preserved in OPTIMIZATION_r12.md for continuity).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bifrost_spark import registry
from bifrost_spark.session import get_spark

# Headline set: the flagship aggregate, a big join, windows, sort/limit,
# dedup + similarity representatives — the operators whose plans matter at
# 100 TB.  (Every other registered query is covered by the driver's
# correctness gate; bench tracks throughput-critical shapes.)
HEADLINE = [
    "q_agg_hash",
    "q_join_inner",
    "q_join_multiway",
    "q_agg_distinct",
    "q_window_rank",
    "q_window_running",
    "q_sort_limit",
    "q_tumbling_window",
    "q_session_window",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_text_stats",
    "q_token_count",
    "q_sim_topk",
    "q_offset_bounds",
    "q_join_asof",
    "q_join_range",
    "q_dedup_embedding",
    "q_pivot",
    "q_grouping_sets",
    "q_composite_report",
    "q_subquery_exists",
    "q_sliding_window",
    "q_funnel",
    "q_cohort_retention",
    "q_scd2",
    "q_merge_upsert",
    "q_tfidf",
    "q_chunking",
    "q_bloom_prune",
    "q_pipeline_e2e",
    "q_stratified_sample",
    # TPC-H heavies: the join/agg/quantifier shapes that dominate at scale
    "q_tpch02",
    "q_tpch05",
    "q_tpch08",
    "q_tpch18",
    "q_tpch21",
    # corpus-cleaning additions
    "q_dup_spans",
    "q_ccnet_bucket",
    "q_domain_cap",
    # round-3 additions: crawl-level dedup, retrieval scoring, data selection
    "q_url_dedup",
    "q_dedup_paragraph",
    "q_bm25",
    "q_dsir_weights",
    "q_dedup_incremental",
    # round-4 additions: drift monitoring, attribution, compaction
    # planning, exact similarity join, collocations, hybrid retrieval
    "q_ks_drift",
    "q_attribution",
    "q_compaction_plan",
    "q_jaccard_ppjoin",
    "q_collocations",
    "q_qlm",
    # round-6 additions: second-stage rerank, incremental fuzzy dedup,
    # contamination reporting, directed containment, bootstrap CI
    "q_rerank_cross",
    "q_dedup_incremental_minhash",
    "q_contamination_report",
    "q_containment",
    "q_bootstrap_ci",
    # round-7 additions: the two sweep heavies the r6 verdict promoted so
    # the driver bench tracks them round-over-round (q_fuzzy_join also
    # carries this round's composite-blocking rewrite), plus the round-7
    # operator family
    "q_fuzzy_join",
    "q_knn_eval",
    "q_dup_flow_matrix",
    "q_rerank_mmr",
    "q_centroid_drift",
    "q_quantile_sketch_rollup",
    # eval_stats representatives: the distinct-value-frame rank device and
    # the |vocab|-frame chi-square fold (the family's two heaviest shapes)
    "q_mann_whitney",
    "q_chi2_keywords",
    # round-8 representatives: the two gram-heavy dedup/contamination
    # shapes, the sketch-summary KS monitor, and the two heaviest
    # statistics shapes (distinct-value-frame ranks; the median-dependent
    # two-scan deviation fold)
    "q_dup_span_ladder",
    "q_contamination_drift",
    "q_sketch_drift",
    "q_kruskal_wallis",
    "q_brown_forsythe",
    # round-9 entries over the 0.3 s headline floor (sweep, sf0.1)
    "q_ngram_novelty",
    "q_group_sequential",
    "q_mood_median",
    "q_cramer_von_mises",
    "q_anderson_darling",
    "q_bpe_merges",
    "q_permutation_test",
    # round-10 entries over the 0.3 s headline floor (sweep, sf0.1), plus
    # the BPE trainer whose cost is its driver-side iteration loop
    "q_dup_span_exact",
    "q_logrank_test",
    "q_kaplan_meier",
    "q_heaps_fit",
    "q_bpe_train",
    "q_rmst",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bifrost-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # Warm the JVM/codegen path AND the Arrow/Python-worker path once on the
    # smallest SF so per-query numbers measure the operator, not first-query
    # JIT or worker spin-up (workers are reused: spark.python.worker.reuse).
    # r11: warm through the SAME noop sink the timed region uses (guide
    # §1.4) so the first timed query doesn't pay one-time noop-writer
    # class-loading; the timed methodology below is unchanged.
    qs["q_agg_hash"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    qs["q_dedup_embedding"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    # Two runs per query, report the min: the warm run measures operator
    # throughput (what scales with data volume) rather than one-time plan
    # compilation / Python-runner initialization, which are per-stage
    # constants independent of scale factor.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()  # r12: clock starts BEFORE build
            df = qs[name](spark, sf_dir)
            # noop action: materializes every row without driver collect
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
