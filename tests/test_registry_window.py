"""The external correctness gate samples the first 50 entries of queries().

These tests pin the window contract: every name in CHECK_PRIORITY must be a
real registered query (a typo would silently shrink the prioritized window),
and the first 50 iteration entries must be exactly CHECK_PRIORITY so the
driver checks the queries this round targets.
"""

from bifrost_spark import registry

WINDOW = 50

# Ids with no driver CORRECTNESS row after rounds 1-3 that the round-4
# window must cover (VERDICT r3 "Next round" item 1), plus q_tpch22 whose
# r3 row was vacuously green on an empty result (VERDICT r3 "What's wrong"
# item 1; de-vacuated this round).
ROUND4_MUST_COVER = {
    # round-3 additions
    "q_dsir_weights",
    "q_dsir_resample",
    "q_bm25",
    "q_snapshot_diff",
    "q_embedding_pca",
    "q_url_dedup",
    "q_dedup_paragraph",
    "q_sim_ann_opq",
    "q_dedup_incremental",
    "q_quality_classifier",
    "q_hard_negatives",
    "q_lm_bigram",
    "q_join_asof_tol",
    "q_rolling_median",
    "q_time_weighted_avg",
    # relational_ext2 stragglers
    "q_bitwise_agg",
    "q_sliding_window",
    "q_map_ops",
    "q_integrity_check",
    "q_zscore",
    "q_feature_hash",
    "q_profile",
    "q_zorder",
    "q_percent_of_total",
    "q_lateral_topn",
    "q_copurchase",
    # de-vacuated
    "q_tpch22",
    # bucket-count parameterization proof (VERDICT r3 item 3)
    "q_dsir_weights_hires",
}


def test_check_priority_names_all_registered():
    registered = set(registry.queries())
    missing = [n for n in registry.CHECK_PRIORITY if n not in registered]
    assert not missing, f"CHECK_PRIORITY names not registered: {missing}"


def test_check_priority_fills_window_exactly():
    assert len(registry.CHECK_PRIORITY) == WINDOW
    assert len(set(registry.CHECK_PRIORITY)) == WINDOW, "duplicates in CHECK_PRIORITY"


def test_window_is_check_priority_in_order():
    first = list(registry.queries())[:WINDOW]
    assert first == list(registry.CHECK_PRIORITY)


def test_round4_targets_inside_window():
    window = set(list(registry.queries())[:WINDOW])
    assert ROUND4_MUST_COVER <= window
