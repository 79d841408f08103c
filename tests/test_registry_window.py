"""The external correctness gate samples the first 50 entries of queries().

These tests pin the window contract: every name in CHECK_PRIORITY must be a
real registered query (a typo would silently shrink the prioritized window),
and the first 50 iteration entries must be exactly CHECK_PRIORITY so the
driver checks the queries this round targets.
"""

import pytest
from bifrost_spark import registry

WINDOW = 50

# Round-10 hard targets (VERDICT r9 "Next round" item 1): the 9
# round-4 ids deferred from the round-9 window, every round-10 addition
# (a new id must land in its own round's window so the driver-unchecked
# backlog never re-grows), and the 27 stalest round-5 standing rows.
ROUND10_MUST_COVER = {
    "q_zscore",
    "q_feature_hash",
    "q_profile",
    "q_zorder",
    "q_percent_of_total",
    "q_lateral_topn",
    "q_copurchase",
    "q_dsir_weights_hires",
    "q_sim_ann_opq",
    "q_kaplan_meier",
    "q_nelson_aalen",
    "q_logrank_test",
    "q_tukey_hsd",
    "q_poisson_rate",
    "q_breslow_day",
    "q_bpe_train",
    "q_heaps_fit",
    "q_dup_span_exact",
    "q_brier_decomp",
    "q_lift_gains",
    "q_rendezvous_shard",
    "q_rmst",
    "q_cochran_armitage",
    "q_ks_drift",
    "q_psi_drift",
    "q_attribution",
    "q_mode_per_group",
    "q_compaction_plan",
    "q_pareto_frontier",
    "q_markov_transitions",
    "q_benford",
    "q_seasonal_baseline",
    "q_behavior_entropy",
    "q_split_balance",
    "q_top_anomalies",
    "q_collocations",
    "q_qlm",
    "q_rrf_fusion",
    "q_tokenizer_fertility",
    "q_vocab_growth",
    "q_dup_fraction",
    "q_jaccard_ppjoin",
    "q_autocorr",
    "q_heavy_hitters_exact",
    "q_negative_sampling",
    "q_temporal_split",
    "q_skew_report",
    "q_classifier_report",
    "q_multimodal_patches",
    "q_embedding_pca",
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


def test_round10_targets_inside_window():
    window = set(list(registry.queries())[:WINDOW])
    assert ROUND10_MUST_COVER <= window


@pytest.mark.slow  # full-surface audit (~100 s) — r12 driver-window default excludes it
def test_registered_outputs_are_scalar_only(spark, sf_dir):
    """The driver canonicalizes EVERY checked result with pandas
    sort_values/hash — array/map/struct cells crash it with 'unhashable
    type' even on rows-only checks (that error, not wrong math, was
    q_embedding_pca's r4 driver row).  Since every registered query
    eventually rotates into a check window, ALL of them must emit scalar
    columns only; flatten arrays to rows (posexplode) before returning."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in registry.queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders
