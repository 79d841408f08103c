"""Recompute-audit regression pins: Catalyst/AQE do NOT deduplicate
identical subtrees consumed by two plan branches (measured round 3:
q_tpch11 scanned lineitem twice, q_tpch18 three times, q_triangle_count
ran 18 parquet scans, PageRank re-derived its transition graph every
iteration).  The fixes checkpoint the small multiply-consumed frames; this
test pins the EXECUTED plan's parquet-scan count for each fixed query so a
refactor can't silently reintroduce the fan-out.

Ceilings are exact current counts (sf-independent — plan shape, not
data).  A lower count is fine; higher fails."""

from __future__ import annotations

import pytest

from bifrost_spark import registry

# query -> max "Scan parquet" occurrences in the executed (post-AQE) plan.
# Checkpointed inputs surface as Scan ExistingRDD, so these counts are the
# per-action fact-table scans the cluster would actually run.
SCAN_CEILINGS = {
    "q_tpch11": 0,  # val checkpointed; threshold + filter read it
    "q_tpch15": 1,  # revenue checkpointed; supplier scan remains
    "q_tpch18": 3,  # big-keys checkpointed; customer/orders/lineitem probes
    "q_tpch20": 2,  # shipped checkpointed; supplier/nation remain
    "q_funnel": 1,  # view/click frontiers checkpointed; purchase scan remains
    "q_pagerank": 0,  # transition graph + nodes checkpointed before the loop
    "q_triangle_count": 0,  # edges + oriented edges checkpointed
    "q_dsir_weights": 1,  # bucket model collected; one scoring explode
    "q_ccnet_bucket": 2,  # surprisal probe + doc lang join
    "q_lm_score": 1,  # term dictionary checkpointed; one probe explode
    "q_mixture_weights": 0,  # per-source aggregate checkpointed
    # Round-3 operators (measured this round, pinned so the recompute
    # discipline can't silently regress):
    "q_bm25": 1,  # df/avgdl as plan literals; one tf explode
    "q_lm_bigram": 1,  # checkpointed bigram model; one scoring pass
    "q_quality_classifier": 1,  # driver-fit weights fold back as literals
    "q_snapshot_diff": 2,  # the two snapshots being diffed
    "q_embedding_pca": 1,  # Gramian collected; one projection pass
    "q_url_dedup": 1,  # pure expression chain + one keep-first window
    "q_dedup_paragraph": 1,  # scan-local paragraphs, window + reassembly
    "q_dedup_incremental": 2,  # new batch + existing-corpus hash sides
    "q_hard_negatives": 2,  # broadcast query side + corpus side
    "q_sim_ann_opq": 3,  # sample fit + pretransform + probe
    "q_dsir_resample": 1,  # weights frame reused via its single explode
    "q_join_asof_tol": 2,  # left + right as-of inputs
    "q_rolling_median": 1,  # one events scan through the bounded frame
    "q_time_weighted_avg": 1,  # single-Exchange window plan
    "q_dsir_weights_hires": 1,  # same plan as q_dsir_weights at 1024 buckets
    # Round-4 pipeline-ops family:
    "q_ks_drift": 0,  # per-value aggregate checkpointed; window+totals reuse it
    "q_psi_drift": 0,  # per-bin aggregate checkpointed
    "q_attribution": 1,  # one window over the type-filtered scan
    "q_mode_per_group": 1,  # count aggregate + rank-1 window
    "q_compaction_plan": 1,  # one manifest scan through the packing window
    "q_dup_spans": 2,  # gram scan feeds dup build + hits probe
    "q_dup_fraction": 3,  # span pipeline (2 scans) + word-count scan
    "q_pareto_frontier": 1,  # one scan through the skyline window
    "q_markov_transitions": 0,  # |types|² pair frame checkpointed
    "q_benford": 0,  # 9-row digit histogram checkpointed
    "q_collocations": 0,  # unigram + bigram aggregates checkpointed
    "q_heavy_hitters_exact": 0,  # count frame checkpointed; total folds back
    "q_negative_sampling": 3,  # interactions (lineitem+orders) + customer draws
    "q_qlm": 1,  # scan-local tf; cf/total fold back as literals
    "q_rrf_fusion": 2,  # one scan per retrieval leg (BM25 + QLM)
    "q_jaccard_ppjoin": 0,  # canonical-order frame checkpointed; 3 consumers
    "q_temporal_split": 1,  # pushed-down filter, zero shuffle
    "q_tokenizer_fertility": 1,  # scan-local measures + tiny lang groupBy
    "q_autocorr": 1,  # one (type, day) aggregate feeds window + moments
    "q_seasonal_baseline": 1,  # profile checkpointed; one scoring scan
    "q_behavior_entropy": 1,  # one count shuffle + user margin window
    "q_split_balance": 1,  # one (label, side) count; margins over 2L cells
    "q_classifier_report": 0,  # confusion matrix checkpointed; 3 margins reuse
    "q_skew_report": 1,  # one count shuffle; windows over the key frame
    "q_vocab_growth": 2,  # token-decile + first-occurrence aggregates
    "q_top_anomalies": 1,  # moment profile checkpointed; one scoring scan
    # Batch-parity anchors for the streaming curation flow (curate.py's
    # Gopher gate asserts equality against q_gopher_rules; decontaminate
    # is the batch spelling of its broadcast-anti stage):
    "q_gopher_rules": 1,  # pure expression gate, single documents scan
    "q_decontaminate": 3,  # bench grams + training grams + id-only join back
}


@pytest.mark.parametrize("name", sorted(SCAN_CEILINGS))
def test_executed_plan_scan_count(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Scan parquet")
    assert n <= SCAN_CEILINGS[name], (
        f"{name}: {n} parquet scans in executed plan "
        f"(ceiling {SCAN_CEILINGS[name]}) — a multiply-consumed frame "
        "lost its checkpoint"
    )
