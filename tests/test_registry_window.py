"""The external correctness gate samples the first 50 entries of queries().

These tests pin the window contract: every name in CHECK_PRIORITY must be a
real registered query (a typo would silently shrink the prioritized window),
and the first 50 iteration entries must be exactly CHECK_PRIORITY so the
driver checks the queries this round targets.
"""

from bifrost_spark import registry

WINDOW = 50

# Round-7 hard targets (VERDICT r6 "Next round" item 1): the 17 ids whose
# standing driver rows date from round 2 (q_fuzzy_join additionally carries
# this round's blocking-key rewrite; q_dedup_minhash / q_dedup_simhash carry
# round 6's content-free signature-filter change, ADVICE r6 item 4), PLUS
# every round-7 addition (a new id must land in its own round's window so
# the driver-unchecked backlog never re-grows).  The rest of the window is
# staleness rotation over the round-3 cohort.
ROUND7_MUST_COVER = {
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
    "q_agg_approx_quantile",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_sim_ann_ivf",
    "q_sim_ann_lsh",
    # round-7 additions (curation/eval + sketch-rollup family)
    "q_dup_flow_matrix",
    "q_rerank_mmr",
    "q_centroid_drift",
    "q_quantile_sketch_rollup",
    "q_trimmed_mean",
    "q_fleiss_kappa",
    # round-7 additions, second batch (eval_stats family)
    "q_mcnemar",
    "q_mann_whitney",
    "q_js_divergence",
    "q_chi2_keywords",
    "q_spearman_corr",
    "q_bh_fdr",
    "q_gini_users",
    "q_cochran_q",
    "q_cramers_v",
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


def test_round7_targets_inside_window():
    window = set(list(registry.queries())[:WINDOW])
    assert ROUND7_MUST_COVER <= window


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
