"""The external correctness gate samples the first 50 entries of queries().

These tests pin the window contract: every name in CHECK_PRIORITY must be a
real registered query (a typo would silently shrink the prioritized window),
and the first 50 iteration entries must be exactly CHECK_PRIORITY so the
driver checks the queries this round targets.
"""

from bifrost_spark import registry

WINDOW = 50

# Round-8 hard targets (VERDICT r7 "Next round" item 1): the 31 ids whose
# standing driver rows date from round 3 — the TPC-H tail, the five other
# round-3 oracle ids, and the round-3 rows-only sketch ids — PLUS every
# round-8 addition (a new id must land in its own round's window so the
# driver-unchecked backlog never re-grows).  The rest of the window is
# staleness rotation over the round-4 cohort.
ROUND8_MUST_COVER = {
    "q_tpch02",
    "q_tpch03",
    "q_tpch04",
    "q_tpch05",
    "q_tpch06",
    "q_tpch07",
    "q_tpch08",
    "q_tpch09",
    "q_tpch10",
    "q_tpch11",
    "q_tpch12",
    "q_tpch13",
    "q_tpch14",
    "q_tpch15",
    "q_tpch16",
    "q_tpch17",
    "q_tpch18",
    "q_tpch19",
    "q_tpch20",
    "q_tpch21",
    "q_join_skew_salted",
    "q_triangle_count",
    "q_lm_score",
    "q_gap_fill",
    "q_percentile_cont",
    "q_hll_rollup",
    "q_decontaminate_fuzzy",
    "q_theta_overlap",
    "q_heavy_hitters",
    "q_dedup_semantic",
    "q_sim_ann_ivfpq",
    # round-8 additions (robust stats + monitoring + dedup/drift shapes)
    "q_anova_f",
    "q_cohens_d",
    "q_kruskal_wallis",
    "q_wilcoxon_signed_rank",
    "q_kendall_tau",
    "q_brown_forsythe",
    "q_friedman_test",
    "q_mad_outliers",
    "q_sprt_monitor",
    "q_cusum_drift",
    "q_jackknife_variance",
    "q_woe_iv",
    "q_contamination_drift",
    "q_dup_span_ladder",
    "q_sketch_drift",
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


def test_round8_targets_inside_window():
    window = set(list(registry.queries())[:WINDOW])
    assert ROUND8_MUST_COVER <= window


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
