"""The external correctness gate samples the first 50 entries of queries().

These tests pin the window contract: every name in CHECK_PRIORITY must be a
real registered query (a typo would silently shrink the prioritized window),
and the first 50 iteration entries must be exactly CHECK_PRIORITY so the
driver checks the queries this round targets.
"""

from bifrost_spark import registry

WINDOW = 50

# Ids with no driver CORRECTNESS row after rounds 1-4 that the round-5
# window must cover (VERDICT r4 "Next round" item 1 — the 26 round-4
# additions), plus q_embedding_pca whose r4 row ERRORED on the array-typed
# output (VERDICT r4 item 2; flattened to scalar rows this round and
# re-proven here).
ROUND5_MUST_COVER = {
    # round-4 pipeline-ops family
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
    # round-4 text/retrieval + dedup + scale ops
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
    # errored r4 row, re-proven after the flat-output fix
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


def test_round5_targets_inside_window():
    window = set(list(registry.queries())[:WINDOW])
    assert ROUND5_MUST_COVER <= window


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
