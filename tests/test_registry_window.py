"""The external correctness gate samples the first 50 entries of queries().

These tests pin the window contract: every name in CHECK_PRIORITY must be a
real registered query (a typo would silently shrink the prioritized window),
and the first 50 iteration entries must be exactly CHECK_PRIORITY so the
driver checks the queries this round targets.
"""

from bifrost_spark import registry

WINDOW = 50

# Round-6 hard targets (VERDICT r5 "Next round" item 1): the six ids whose
# standing driver rows date from round 1 and were never re-checked since,
# PLUS every round-6 addition (a new id must land in its own round's window
# so the driver-unchecked backlog never re-grows).  The rest of the window
# is staleness rotation over the round-2 cohort.
ROUND6_MUST_COVER = {
    "q_agg_approx",
    "q_string_agg",
    "q_date_arith",
    "q_regex_extract",
    "q_null_semantics",
    "q_min_max_by",
    # round-6 additions (curation_ops.py + the incremental-minhash twin)
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


def test_round6_targets_inside_window():
    window = set(list(registry.queries())[:WINDOW])
    assert ROUND6_MUST_COVER <= window


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
