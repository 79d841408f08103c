"""The external correctness gate samples the first 50 entries of queries().

These tests pin the window contract: every name in CHECK_PRIORITY must be a
real registered query (a typo would silently shrink the prioritized window),
and the first 50 iteration entries must be exactly CHECK_PRIORITY so the
driver checks the queries this round targets.
"""

from bifrost_spark import registry

WINDOW = 50

# Round-9 hard targets (VERDICT r8 "Next round" item 1): the round-4
# cohort — the ids whose standing driver rows date from round 4 (the
# relational core, q_tpch22, the dsir ids, the web-dedup family) — PLUS
# every round-9 addition (a new id must land in its own round's window so
# the driver-unchecked backlog never re-grows).  9 round-4 ids spill to
# round 10 to make room for the 14 round-9 additions.
ROUND9_MUST_COVER = {
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
    # round-9 additions (distributional/trend tests, experimentation
    # design, tokenizer/corpus statistics)
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


def test_round9_targets_inside_window():
    window = set(list(registry.queries())[:WINDOW])
    assert ROUND9_MUST_COVER <= window


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
