"""Adversarial oracle-parity fuzzing for the events-based pipeline ops.

The driver (and tests/test_oracle_parity.py) prove plan↔oracle parity on
ONE fixture distribution.  These tests generate adversarial small event
corpora — empty cohorts, single-user streams, tied timestamps, negative
and zero metric values, types missing entirely — write them as a
fixture-shaped events.parquet (other tables symlinked from the real
fixture), and require the REAL registered query and its REAL DuckDB
oracle to agree on every one.  No re-spelled "reference
implementation" that could drift from production code: the property is
exactly the driver's check, on inputs the fixture never exercises.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from bifrost_spark import registry
from oracle_harness import compare, duckdb_connection
from conftest import SF_DIR

# Generated events straddle (or miss) the 2024-01-16 cohort split used by
# the drift queries; values include 0, negatives, and bin-edge magnitudes.
# r12: adversarial fuzz / audit suite — excluded from the default
# (driver-window) run via pytest.ini; run with -m "" or -m slow.
pytestmark = pytest.mark.slow

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

# Telemetry props payloads: valid integer k, string/NULL/missing k,
# malformed JSON, the empty string, NULL, arrays, nesting, unicode keys.
# No FLOAT k by contract: DuckDB's TRY_CAST('1.9' AS BIGINT) rounds to 2
# where Spark's try_cast (and variant_get) NULL/truncate — integer-literal
# k is the declared schema, junk is the hazard being fuzzed.
PROPS_POOL = (
    '{"k": 7}',
    '{"k": -3}',
    '{"k": 123, "nested": {"a": [1, 2]}}',
    '{"k": "abc"}',  # string-valued k: try_cast → NULL, never an abort
    '{"k": null}',
    '{}',  # k missing entirely
    "not json",  # malformed: json_valid gates the oracle, Spark NULLs
    "",  # empty string is NOT valid JSON
    None,
    "[]",  # valid JSON, no $.k path
    '{"κλειδί": "значение", "k": 0}',
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),  # user_id
        st.sampled_from(EVENT_TYPES),
        # half the draws land on three fixed instants, so same-(user, ts)
        # ties are COMMON, not astronomically rare: any window ordered by
        # ts without a deterministic tiebreaker diverges cross-engine
        st.one_of(
            st.sampled_from((0, 3600, 16 * 24 * 3600)),
            st.integers(0, 30 * 24 * 3600 - 1),
        ),
        # value in cents: negatives + bin edges + NULL (broken feeds emit
        # NULL metrics; Spark windows sort NULLS FIRST where DuckDB
        # defaults NULLS LAST, so every value-ordered frame is at risk)
        st.one_of(st.none(), st.integers(-100, 50_000)),
        st.sampled_from(PROPS_POOL),
    ),
    min_size=0,
    max_size=40,
)

# Every registered query that reads ONLY the events table and has a
# DuckDB oracle (enumerated from load_table calls; keep in sync).
FUZZED_QUERIES = (
    "q_ab_test",
    "q_agg_distinct",
    "q_attribution",
    "q_autocorr",
    "q_behavior_entropy",
    "q_bh_fdr",
    "q_bootstrap_ci",
    "q_cohort_retention",
    "q_commit_offsets",
    "q_ctr_wilson",
    "q_ewma",
    "q_quantile_sketch_rollup",
    "q_trimmed_mean",
    # round-10 events-based survival + experiment families
    "q_tukey_hsd",
    "q_poisson_rate",
    "q_breslow_day",
    "q_rmst",
    "q_cochran_armitage",
    "q_kaplan_meier",
    "q_nelson_aalen",
    "q_logrank_test",
    # round-9 events-based dist/experiment test family
    "q_cramer_von_mises",
    "q_anderson_darling",
    "q_mood_median",
    "q_runs_test",
    "q_mann_kendall",
    "q_group_sequential",
    "q_mantel_haenszel",
    "q_permutation_test",
    "q_page_hinkley",
    # round-8 events-based statistics/monitoring family
    "q_anova_f",
    "q_wilcoxon_signed_rank",
    "q_brown_forsythe",
    "q_friedman_test",
    "q_mad_outliers",
    "q_sprt_monitor",
    "q_cusum_drift",
    "q_jackknife_variance",
    "q_woe_iv",
    "q_sketch_drift",
    "q_filter_pushdown",
    "q_funnel",
    "q_gini_users",
    "q_interval_merge",
    "q_join_asof",
    "q_join_asof_tol",
    "q_join_range",
    "q_json_extract",
    "q_json_schema",
    "q_ks_drift",
    "q_map_ops",
    "q_markov_transitions",
    "q_object_keys",
    "q_offset_bounds",
    "q_pagerank",
    "q_partition_demux",
    "q_pivot",
    "q_psi_drift",
    "q_rolling_median",
    "q_running_distinct",
    "q_scan_events",
    "q_scd2",
    "q_seasonal_baseline",
    "q_seq_pattern",
    "q_session_window",
    "q_sliding_window",
    "q_stratified_sample",
    "q_temporal_split",
    "q_time_weighted_avg",
    "q_top_anomalies",
    "q_topic_discovery",
    "q_topic_filter",
    "q_tumbling_window",
    "q_variant",
    "q_window_lead_lag",
    "q_window_range_frame",
    "q_window_running",
)


def _write_fixture_dir(tmpdir: str, events) -> str:
    """Symlink every fixture table into tmpdir, then replace events."""
    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmpdir, f))
    os.unlink(os.path.join(tmpdir, "events.parquet"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01 00:00:00")
    # rows may be 4-tuples (legacy examples) or 5-tuples with props
    events = [e if len(e) == 5 else (*e, '{"k": 0}') for e in events]
    # explicit arrow schema: an EMPTY pandas object column would otherwise
    # round-trip as the `null` arrow type and load as VOID in Spark
    table = pa.table(
        {
            "event_id": pa.array(range(len(events)), pa.int64()),
            "ts": pa.array(
                [base + pd.Timedelta(seconds=s) for _, _, s, _, _ in events],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _, _, _, _ in events], pa.int64()),
            "event_type": pa.array(
                [t for _, t, _, _, _ in events], pa.string()
            ),
            "value": pa.array(
                [None if c is None else c / 100.0 for _, _, _, c, _ in events],
                pa.float64(),
            ),
            "props": pa.array([p for _, _, _, _, p in events], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


@pytest.mark.parametrize("name", FUZZED_QUERIES)
@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,  # stable example set; drop to re-hunt
    suppress_health_check=list(HealthCheck),
)
@given(events=events_strategy)
@example(events=[])  # empty stream
@example(events=[(0, "view", 0, None)])  # all-NULL metric column
@example(  # heavy (user, ts) ties incl. equal values: every window
    # ordered by ts (or by value) must break ties deterministically
    events=[(0, "view", 0, 100), (0, "click", 0, 100),
            (0, "view", 0, 200), (1, "view", 0, 100),
            (1, "purchase", 0, None), (1, "view", 0, 100)]
)
@example(  # NULL value amid real ones: ordering/frame divergence probe
    events=[(0, "view", 0, 100), (0, "view", 3600, None),
            (0, "view", 7200, 50)]
)
@example(  # junk telemetry props: malformed JSON, string-valued k, the
    # empty string, NULL, pathless arrays — next to one clean row
    events=[(0, "view", 0, 100, "not json"),
            (0, "view", 60, 100, '{"k": "abc"}'),
            (1, "click", 0, None, ""), (1, "view", 60, 50, None),
            (2, "view", 0, 50, "[]"), (2, "view", 60, 50, '{"k": 7}')]
)
@example(  # NULL event_type (schema permits it; the fixture never has
    # one): a metric value seen ONLY under NULL type is the SUM-flag
    # NULL-poison cell (ADVICE r9 / q_mood_median class); users whose
    # events are ALL NULL-typed probe every type-keyed groupBy/map/
    # symbol fold for drop-vs-keep agreement (round-10 fuzzer catch:
    # q_map_ops NULL_MAP_KEY crash, q_object_keys printf-vs-format_string,
    # q_seq_pattern ''-vs-NULL fold)
    events=[(0, None, 0, 100), (0, "view", 0, 100), (1, None, 86400, 50),
            (2, None, 3600, None), (3, "purchase", 7200, 200)]
)
@example(events=[(0, "click", 0, 100)])  # one cohort empty (KS guard)
@example(events=[(0, "purchase", 0, 100)])  # organic purchase, no click
@example(  # constant daily series: zero-variance autocorr -> NULL
    events=[(0, "view", 0, 100), (0, "view", 86400, 100),
            (0, "view", 172800, 100)]
)
def test_plan_oracle_parity_on_adversarial_events(
    spark, tmp_path_factory, name, events
):
    tmpdir = _write_fixture_dir(
        str(tmp_path_factory.mktemp("fuzz")), events
    )
    spark_df = registry.queries()[name](spark, tmpdir)
    con = duckdb_connection(tmpdir)
    try:
        oracle_pdf = con.execute(registry.oracles()[name]).fetchdf()
    finally:
        con.close()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name} diverged on {events!r}: {problems}"


# ---------------------------------------------------------------------------
# documents-based text ops: empty corpus, empty/whitespace-only texts,
# unicode, single-word docs, heavy repetition, vocabulary collisions
# ---------------------------------------------------------------------------

WORDS = ("the", "of", "and", "data", "model", "x", "naïve", "Ünïcode", "a1")

text_strategy = st.lists(
    st.one_of(st.sampled_from(WORDS), st.just("")), min_size=0, max_size=12
).map(" ".join)

documents_strategy = st.lists(
    st.tuples(
        # None: a crawl row with NULL text (failed extraction) — distinct
        # from the empty string, and a different hazard class (split/
        # length/token expressions all go NULL instead of 0)
        st.one_of(st.none(), text_strategy),
        # NULL lang/source: missing metadata — every per-lang/per-source
        # groupBy gets a NULL group, and Spark/DuckDB must agree on its
        # membership, ordering, and share-of-total arithmetic
        st.one_of(st.none(), st.sampled_from(("en", "de", "fr"))),
        st.one_of(st.none(), st.sampled_from(("web", "wiki", "books"))),
    ),
    min_size=0,
    max_size=12,
)

# Every registered query that reads ONLY the documents table and has a
# DuckDB oracle (enumerated from load_table calls; keep in sync).
DOC_QUERIES = (
    "q_bm25",
    "q_calibration_bins",
    "q_ccnet_bucket",
    "q_chi2_keywords",
    "q_chunking",
    "q_cochran_q",
    "q_cramers_v",
    "q_collocations",
    "q_compaction_plan",
    "q_containment",
    "q_contamination_report",
    "q_dataset_split",
    "q_dataset_split_grouped",
    "q_decontaminate",
    "q_dedup_cluster",
    "q_dedup_exact",
    "q_dedup_incremental",
    "q_dedup_keep_best",
    "q_dedup_ngram_jaccard",
    "q_dedup_paragraph",
    "q_dedup_prefix",
    "q_domain_cap",
    "q_dsir_resample",
    "q_dsir_weights",
    "q_dsir_weights_hires",
    "q_dup_flow_matrix",
    "q_dup_fraction",
    "q_dup_spans",
    # round-10 documents-based tokenizer-training + calibration families
    "q_brier_decomp",
    "q_rendezvous_shard",
    "q_lift_gains",
    "q_dup_span_exact",
    "q_bpe_train",
    "q_heaps_fit",
    # round-9 documents-based corpus-statistics family
    "q_bpe_merges",
    "q_ngram_novelty",
    "q_zipf_fit",
    "q_chao1_vocab",
    "q_good_turing",
    # round-8 documents-based statistics/dedup family
    "q_cohens_d",
    "q_kruskal_wallis",
    "q_kendall_tau",
    "q_contamination_drift",
    "q_dup_span_ladder",
    "q_entropy",
    "q_explode_tokens",
    "q_feature_hash",
    "q_fingerprint",
    "q_fleiss_kappa",
    "q_freq_spectrum",
    "q_gopher_rules",
    "q_hapax_report",
    "q_heavy_hitters_exact",
    "q_jaccard_ppjoin",
    "q_js_divergence",
    "q_kappa_agreement",
    "q_lang_id",
    "q_lm_bigram",
    "q_lm_score",
    "q_mann_whitney",
    "q_mcnemar",
    "q_mixture_weights",
    "q_multimodal_decode",
    "q_multimodal_dedup",
    "q_multimodal_frames",
    "q_multimodal_meta",
    "q_multimodal_pair",
    "q_ndcg_eval",
    "q_pack_sequences",
    "q_pii_redact",
    "q_pipeline_e2e",
    "q_qlm",
    "q_quality_score",
    "q_repetition",
    "q_rerank_cross",
    "q_rerank_mmr",
    "q_rrf_fusion",
    "q_sample_mixture",
    "q_spearman_corr",
    "q_text_stats",
    "q_tfidf",
    "q_token_count",
    "q_tokenizer_fertility",
    "q_udf_pandas",
    "q_url_dedup",
    "q_vocab_growth",
)


def _write_documents_dir(tmpdir: str, docs) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmpdir, f))
    os.unlink(os.path.join(tmpdir, "documents.parquet"))
    table = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([t for t, _, _ in docs], pa.string()),
            "lang": pa.array([l for _, l, _ in docs], pa.string()),
            "source": pa.array([s for _, _, s in docs], pa.string()),
            "n_chars": pa.array(
                [None if t is None else len(t) for t, _, _ in docs],
                pa.int64(),
            ),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "documents.parquet"))
    return tmpdir


@pytest.mark.parametrize("name", DOC_QUERIES)
@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,  # stable example set; drop to re-hunt
    suppress_health_check=list(HealthCheck),
)
@given(docs=documents_strategy)
@example(docs=[])  # empty corpus (totals/avgdl/max-id guards)
@example(docs=[(None, "en", "web")])  # NULL text (failed extraction)
@example(docs=[(None, "en", "web"), ("x", "de", "wiki")])  # NULL + real
@example(docs=[("x y", None, None)])  # metadata lost: NULL lang + source
@example(  # NULL lang amid real groups: NULL-group membership/ordering
    docs=[("a b", None, "web"), ("a b", "en", None), ("c", "en", "web")]
)
@example(docs=[("", "en", "web")])  # zero-word doc (gopher divide guard)
@example(docs=[("x", "en", "web")])  # single-char doc (entropy -0.0)
@example(docs=[("x", "en", "web"), ("", "de", "wiki")])  # zero-token lang
@example(  # BPE hazards: 0x01/0x02 wrapper bytes inside words (excluded
    # from tokenizer training by contract on BOTH engines) next to the
    # "aaaa" overlapping-pair word (greedy left-to-right application)
    docs=[("a\x01b c aaaa", "en", "web"), ("aaaa aaaa of the", "en", "wiki"),
          ("c\x02d aaaa", None, "web")]
)
@example(  # two NULL-text docs: xxhash64(NULL) = 42 made a phantom
    # Jaccard pair where NULL string keys never equi-join (round-5 find)
    docs=[(None, None, None), (None, None, None)]
)
def test_plan_oracle_parity_on_adversarial_documents(
    spark, tmp_path_factory, name, docs
):
    tmpdir = _write_documents_dir(str(tmp_path_factory.mktemp("fuzzdoc")), docs)
    spark_df = registry.queries()[name](spark, tmpdir)
    con = duckdb_connection(tmpdir)
    try:
        oracle_pdf = con.execute(registry.oracles()[name]).fetchdf()
    finally:
        con.close()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name} diverged on {docs!r}: {problems}"


# ---------------------------------------------------------------------------
# orders-based ops: tie-heavy groups, zero/tiny prices (Benford first-digit
# edges), skewed key distributions
# ---------------------------------------------------------------------------

orders_strategy = st.lists(
    st.tuples(
        # o_custkey: skew-prone tiny domain + NULL (guest orders form a
        # NULL group in mode/skew reports)
        st.one_of(st.none(), st.integers(0, 5)),
        st.sampled_from(("F", "O", "P")),
        st.integers(1, 10_000_000),  # totalprice in cents (>0 like TPC-H)
        st.integers(0, 700),  # order date offset days
        st.sampled_from(
            ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        ),
    ),
    min_size=0,
    max_size=25,
)

ORDER_QUERIES = ("q_mode_per_group", "q_benford", "q_skew_report")


def _write_orders_dir(tmpdir: str, orders) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmpdir, f))
    os.unlink(os.path.join(tmpdir, "orders.parquet"))
    base = pd.Timestamp("1996-01-01")
    table = pa.table(
        {
            "o_orderkey": pa.array(range(len(orders)), pa.int64()),
            "o_custkey": pa.array([c for c, _, _, _, _ in orders], pa.int64()),
            "o_orderstatus": pa.array(
                [s for _, s, _, _, _ in orders], pa.string()
            ),
            "o_totalprice": pa.array(
                [p / 100.0 for _, _, p, _, _ in orders], pa.float64()
            ),
            "o_orderdate": pa.array(
                [base + pd.Timedelta(days=d) for _, _, _, d, _ in orders],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                [pr for _, _, _, _, pr in orders], pa.string()
            ),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "orders.parquet"))
    return tmpdir


@pytest.mark.parametrize("name", ORDER_QUERIES)
@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,  # stable example set; drop to re-hunt
    suppress_health_check=list(HealthCheck),
)
@given(orders=orders_strategy)
@example(orders=[])  # empty table
@example(  # EVEN key count: the median cast-rounding divergence
    orders=[(0, "F", 1, 0, "1-URGENT"), (0, "F", 1, 0, "1-URGENT"),
            (1, "F", 1, 0, "1-URGENT")]
)
def test_plan_oracle_parity_on_adversarial_orders(
    spark, tmp_path_factory, name, orders
):
    tmpdir = _write_orders_dir(str(tmp_path_factory.mktemp("fuzzord")), orders)
    spark_df = registry.queries()[name](spark, tmpdir)
    con = duckdb_connection(tmpdir)
    try:
        oracle_pdf = con.execute(registry.oracles()[name]).fetchdf()
    finally:
        con.close()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name} diverged on {orders!r}: {problems}"


# ---------------------------------------------------------------------------
# relational ops over coordinated customer/orders/lineitem (nation/region/
# part/supplier stay the fixture versions): empty tables, dangling foreign
# keys (stress anti/outer joins), constant groups (zero variance/IQR),
# single-row tables, duplicate keys
# ---------------------------------------------------------------------------

SEGMENTS = ("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE")
PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

relational_strategy = st.tuples(
    st.lists(  # customers: (nationkey, acctbal_cents, segment)
        st.tuples(st.integers(0, 24), st.integers(-99999, 999999),
                  st.sampled_from(SEGMENTS)),
        min_size=0, max_size=8,
    ),
    st.lists(  # orders: (custkey MAY dangle OR be NULL — a guest order
        #           with no registered customer; NULL keys are the classic
        #           NOT IN / anti-join / outer-join semantics trap)
        st.tuples(st.one_of(st.none(), st.integers(0, 10)),
                  st.sampled_from(("F", "O", "P")),
                  st.integers(1, 10_000_000), st.integers(0, 900),
                  st.sampled_from(PRIORITIES)),
        min_size=0, max_size=15,
    ),
    st.lists(  # lineitems: (orderkey MAY dangle or be NULL, partkey,
        #   suppkey, qty, price_cents, disc_bp, tax_bp, rflag, lstatus,
        #   ship_day)
        st.tuples(st.one_of(st.none(), st.integers(0, 18)),
                  st.integers(0, 30), st.integers(0, 10),
                  st.integers(1, 50), st.integers(1, 9_999_999),
                  st.integers(0, 10), st.integers(0, 8),
                  st.sampled_from(("R", "A", "N")),
                  st.sampled_from(("O", "F")), st.integers(0, 900)),
        min_size=0, max_size=25,
    ),
)

RELATIONAL_QUERIES = (
    "q_agg_hash", "q_agg_stats", "q_benford", "q_bitwise_agg",
    "q_bloom_prune", "q_composite_report", "q_cond_agg", "q_copurchase",
    "q_corr", "q_cube", "q_date_arith", "q_gap_fill", "q_grouping_sets",
    "q_histogram", "q_integrity_check", "q_join_anti", "q_join_full",
    "q_join_inner", "q_join_left", "q_join_multiway", "q_join_semi",
    "q_join_skew_salted", "q_lateral_topn", "q_median", "q_merge_upsert",
    "q_min_max_by",
    "q_mode_per_group", "q_negative_sampling", "q_ntile",
    "q_null_semantics", "q_outlier_iqr", "q_percent_of_total",
    "q_percentile_cont", "q_profile", "q_project_expr", "q_regex_extract",
    "q_rollup", "q_scalar_funcs", "q_set_ops", "q_skew_report", "q_sql_api",
    "q_snapshot_diff", "q_sort_limit", "q_string_agg", "q_subquery_exists",
    "q_subquery_not_in", "q_subquery_scalar", "q_tpch02", "q_tpch03",
    "q_tpch04", "q_tpch05", "q_tpch06", "q_tpch07", "q_tpch08", "q_tpch09",
    "q_tpch10", "q_tpch11", "q_tpch12", "q_tpch13", "q_tpch14", "q_tpch15",
    "q_tpch16", "q_tpch17", "q_tpch18", "q_tpch19", "q_tpch20", "q_tpch21",
    "q_tpch22", "q_triangle_count", "q_udaf_pandas", "q_window_distribution",
    "q_window_rank", "q_zorder", "q_zscore",
)


def _write_relational_dir(tmpdir: str, rel) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    customers, orders, lineitems = rel
    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmpdir, f))
    for t in ("customer", "orders", "lineitem"):
        os.unlink(os.path.join(tmpdir, f"{t}.parquet"))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(len(customers)), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(len(customers))],
                    pa.string(),
                ),
                "c_nationkey": pa.array(
                    [n for n, _, _ in customers], pa.int32()
                ),
                "c_acctbal": pa.array(
                    [b / 100.0 for _, b, _ in customers], pa.float64()
                ),
                "c_mktsegment": pa.array(
                    [s for _, _, s in customers], pa.string()
                ),
            }
        ),
        os.path.join(tmpdir, "customer.parquet"),
    )
    base = pd.Timestamp("1996-01-01")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(orders)), pa.int64()),
                "o_custkey": pa.array([c for c, *_ in orders], pa.int64()),
                "o_orderstatus": pa.array(
                    [s for _, s, *_ in orders], pa.string()
                ),
                "o_totalprice": pa.array(
                    [p / 100.0 for _, _, p, *_ in orders], pa.float64()
                ),
                "o_orderdate": pa.array(
                    [base + pd.Timedelta(days=d) for *_, d, _ in orders],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    [pr for *_, pr in orders], pa.string()
                ),
            }
        ),
        os.path.join(tmpdir, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([o for o, *_ in lineitems], pa.int64()),
                "l_partkey": pa.array(
                    [p for _, p, *_ in lineitems], pa.int64()
                ),
                "l_suppkey": pa.array(
                    [s for _, _, s, *_ in lineitems], pa.int64()
                ),
                "l_linenumber": pa.array(
                    list(range(1, len(lineitems) + 1)), pa.int32()
                ),
                "l_quantity": pa.array(
                    [float(q) for _, _, _, q, *_ in lineitems], pa.float64()
                ),
                "l_extendedprice": pa.array(
                    [p / 100.0 for _, _, _, _, p, *_ in lineitems],
                    pa.float64(),
                ),
                "l_discount": pa.array(
                    [d / 100.0 for *_, d, _, _, _, _ in lineitems],
                    pa.float64(),
                ),
                "l_tax": pa.array(
                    [t / 100.0 for *_, t, _, _, _ in lineitems], pa.float64()
                ),
                "l_returnflag": pa.array(
                    [r for *_, r, _, _ in lineitems], pa.string()
                ),
                "l_linestatus": pa.array(
                    [s for *_, s, _ in lineitems], pa.string()
                ),
                "l_shipdate": pa.array(
                    [base + pd.Timedelta(days=d) for *_, d in lineitems],
                    pa.timestamp("us"),
                ),
            }
        ),
        os.path.join(tmpdir, "lineitem.parquet"),
    )
    return tmpdir


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
@settings(
    max_examples=3,
    deadline=None,
    derandomize=True,  # stable example set; drop to re-hunt
    suppress_health_check=list(HealthCheck),
)
@given(rel=relational_strategy)
@example(rel=([], [], []))  # all three tables empty
@example(  # dangling keys both directions; one customer, constant group
    rel=(
        [(0, 100, "BUILDING")],
        [(5, "F", 100, 0, "1-URGENT"), (0, "F", 100, 0, "1-URGENT")],
        [(9, 0, 0, 1, 100, 0, 0, "R", "O", 0),
         (0, 0, 0, 1, 100, 0, 0, "R", "O", 0)],
    )
)
@example(  # single lineitem: a singleton group per (rflag, status) —
    # sample variance has a 0 divisor at n = 1 (q_agg_stats regression)
    rel=([], [], [(0, 0, 0, 7, 100, 0, 0, "R", "O", 0)])
)
@example(  # NULL foreign keys both levels: a guest order (NULL custkey)
    # and an orphan lineitem (NULL orderkey) — NOT IN with a NULL in the
    # subquery list, anti joins, and outer joins all hinge on these
    rel=(
        [(0, 100, "BUILDING"), (1, -50, "MACHINERY")],
        [(None, "F", 100, 0, "1-URGENT"), (0, "O", 200, 10, "5-LOW")],
        [(None, 0, 0, 1, 100, 0, 0, "R", "O", 0),
         (1, 1, 1, 2, 300, 5, 2, "A", "F", 20)],
    )
)
def test_plan_oracle_parity_on_adversarial_relational(
    spark, tmp_path_factory, name, rel
):
    tmpdir = _write_relational_dir(str(tmp_path_factory.mktemp("fuzzrel")), rel)
    spark_df = registry.queries()[name](spark, tmpdir)
    con = duckdb_connection(tmpdir)
    try:
        oracle_pdf = con.execute(registry.oracles()[name]).fetchdf()
    finally:
        con.close()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name} diverged on {rel!r}: {problems}"


# ---------------------------------------------------------------------------
# embeddings-based ops: zero vectors (cosine 0/0), duplicate vectors (tied
# similarities), constant labels (no hard negatives), empty train or test
# side of the TRAIN_MAX split, single-vector corpora
# ---------------------------------------------------------------------------

# Rows: (is_test, label, components).  Components are small-integer
# multiples of 1/4 → exact in float32, so cross-engine float→double casts
# are lossless.  Dim fixed at 4 per corpus (the plans read len(embedding)).
embeddings_strategy = st.lists(
    st.tuples(
        st.booleans(),  # test side (vec_id >= TRAIN_MAX) or train side
        st.integers(0, 2),  # label
        # None: the embedding job failed for this row — the vector column
        # is NULL, not an empty or zero list.  Every norm/size/zip_with
        # expression goes NULL and every numpy kernel would see None.
        st.one_of(
            st.none(), st.lists(st.integers(-8, 8), min_size=4, max_size=4)
        ),
    ),
    min_size=0,
    max_size=10,
)

EMB_QUERIES = (
    "q_array_ops",
    "q_classifier_report",
    "q_centroid_drift",
    "q_dedup_embedding",
    "q_embedding_centroid",
    "q_embedding_norm",
    "q_embedding_outliers",
    "q_embedding_quant",
    "q_hard_negatives",
    "q_knn_eval",
    "q_sim_topk",
    "q_split_balance",
)


def _write_embeddings_dir(tmpdir: str, rows) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmpdir, f))
    os.unlink(os.path.join(tmpdir, "embeddings.parquet"))
    # train rows take ids 0,1,2,… (ids < N_QUERIES double as the query
    # vectors); test rows take ids 400,401,… (the TRAIN_MAX split)
    ids, next_train, next_test = [], 0, 400
    for is_test, _, _ in rows:
        if is_test:
            ids.append(next_test)
            next_test += 1
        else:
            ids.append(next_train)
            next_train += 1
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [
                    None if vec is None else [v / 4.0 for v in vec]
                    for _, _, vec in rows
                ],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([l for _, l, _ in rows], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "embeddings.parquet"))
    return tmpdir


@pytest.mark.parametrize("name", EMB_QUERIES)
@settings(
    max_examples=3,
    deadline=None,
    derandomize=True,  # stable example set; drop to re-hunt
    suppress_health_check=list(HealthCheck),
)
@given(rows=embeddings_strategy)
@example(rows=[])  # empty corpus
@example(rows=[(False, 0, None)])  # all embeddings NULL (job failed)
@example(  # NULL embedding amid real ones: guards must drop, not crash
    rows=[(False, 0, None), (False, 1, [4, 0, 0, 0]),
          (True, 2, [0, 4, 0, 0]), (True, 0, None)]
)
@example(rows=[(False, 0, [0, 0, 0, 0])])  # one zero vector: cosine 0/0
@example(  # zero query vs nonzero corpus + duplicate vectors (tied cosine)
    rows=[(False, 0, [0, 0, 0, 0]), (False, 1, [4, 0, 0, 0]),
          (False, 1, [4, 0, 0, 0]), (True, 0, [0, 4, 0, 0])]
)
@example(  # all same label: hard-negative set empty; test side populated
    rows=[(False, 2, [4, 0, 0, 0]), (False, 2, [0, 4, 0, 0]),
          (True, 2, [0, 0, 4, 0])]
)
def test_plan_oracle_parity_on_adversarial_embeddings(
    spark, tmp_path_factory, name, rows
):
    tmpdir = _write_embeddings_dir(str(tmp_path_factory.mktemp("fuzzemb")), rows)
    spark_df = registry.queries()[name](spark, tmpdir)
    con = duckdb_connection(tmpdir)
    try:
        oracle_pdf = con.execute(registry.oracles()[name]).fetchdf()
    finally:
        con.close()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name} diverged on {rows!r}: {problems}"


# ---------------------------------------------------------------------------
# nation/region (q_collect_sorted — the last oracle query no other
# strategy mutates): duplicate and comma-containing and non-ASCII nation
# names (sort-order + delimiter stress), NULL names (both engines'
# collectors skip them), dangling/NULL region keys, duplicate REGION
# names (two regions merging into one output group), empty tables
# ---------------------------------------------------------------------------

NATION_NAMES = ("FRANCE", "france", "CÔTE D'IVOIRE", "A,B", "ÅLAND", None)

nation_region_strategy = st.tuples(
    st.lists(  # regions: (regionkey, name — duplicates allowed)
        st.tuples(st.integers(0, 3), st.sampled_from(("EUROPE", "ASIA"))),
        min_size=0, max_size=4,
    ),
    st.lists(  # nations: (regionkey MAY dangle or be NULL, name MAY be NULL)
        st.tuples(st.one_of(st.none(), st.integers(0, 5)),
                  st.sampled_from(NATION_NAMES)),
        min_size=0, max_size=10,
    ),
)


def _write_nation_region_dir(tmpdir: str, rel) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    regions, nations = rel
    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmpdir, f))
    for t in ("nation", "region"):
        os.unlink(os.path.join(tmpdir, f"{t}.parquet"))
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(
                    [k for k, _ in regions], pa.int32()
                ),
                "r_name": pa.array([n for _, n in regions], pa.string()),
            }
        ),
        os.path.join(tmpdir, "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(len(nations)), pa.int32()),
                "n_name": pa.array([n for _, n in nations], pa.string()),
                "n_regionkey": pa.array(
                    [k for k, _ in nations], pa.int32()
                ),
            }
        ),
        os.path.join(tmpdir, "nation.parquet"),
    )
    return tmpdir


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,  # stable example set; drop to re-hunt
    suppress_health_check=list(HealthCheck),
)
@given(rel=nation_region_strategy)
@example(rel=([], []))  # both empty
@example(  # duplicate region keys AND names: the join fans out, the
    # groups merge; NULL + comma + case-variant + accented names sort
    rel=(
        [(0, "EUROPE"), (0, "EUROPE"), (1, "EUROPE")],
        [(0, "A,B"), (0, None), (0, "france"), (1, "FRANCE"),
         (None, "ÅLAND"), (5, "CÔTE D'IVOIRE")],
    )
)
def test_plan_oracle_parity_on_adversarial_nation_region(
    spark, tmp_path_factory, rel
):
    name = "q_collect_sorted"
    tmpdir = _write_nation_region_dir(
        str(tmp_path_factory.mktemp("fuzznat")), rel
    )
    spark_df = registry.queries()[name](spark, tmpdir)
    con = duckdb_connection(tmpdir)
    try:
        oracle_pdf = con.execute(registry.oracles()[name]).fetchdf()
    finally:
        con.close()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name} diverged on {rel!r}: {problems}"


# ---------------------------------------------------------------------------
# part-based ops: name near-collisions (fuzzy join), duplicate
# (size, price) points (Pareto ties), single-part and empty tables
# ---------------------------------------------------------------------------

PART_NAMES = ("azure", "azuze", "rose", "rosy", "navy blue", "navy")
PART_BRANDS = ("Brand#1", "Brand#2")
PART_TYPES = ("STANDARD", "ECONOMY")

part_strategy = st.lists(
    st.tuples(
        st.sampled_from(PART_NAMES),
        st.sampled_from(PART_BRANDS),
        st.sampled_from(PART_TYPES),
        st.integers(1, 8),  # p_size (tiny domain → Pareto ties)
        st.integers(100, 99999),  # retailprice in cents
    ),
    min_size=0,
    max_size=12,
)

PART_QUERIES = (
    "q_fuzzy_join",
    "q_pareto_frontier",
    "q_recursive_cte",
    "q_unpivot",
)


def _write_part_dir(tmpdir: str, parts) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmpdir, f))
    os.unlink(os.path.join(tmpdir, "part.parquet"))
    table = pa.table(
        {
            "p_partkey": pa.array(range(len(parts)), pa.int64()),
            "p_name": pa.array([n for n, _, _, _, _ in parts], pa.string()),
            "p_brand": pa.array([b for _, b, _, _, _ in parts], pa.string()),
            "p_type": pa.array([t for _, _, t, _, _ in parts], pa.string()),
            "p_size": pa.array([s for _, _, _, s, _ in parts], pa.int32()),
            "p_retailprice": pa.array(
                [p / 100.0 for _, _, _, _, p in parts], pa.float64()
            ),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "part.parquet"))
    return tmpdir


@pytest.mark.parametrize("name", PART_QUERIES)
@settings(
    max_examples=3,
    deadline=None,
    derandomize=True,  # stable example set; drop to re-hunt
    suppress_health_check=list(HealthCheck),
)
@given(parts=part_strategy)
@example(parts=[])  # empty table
@example(  # duplicate Pareto points + near-identical names in one brand
    parts=[("azure", "Brand#1", "STANDARD", 1, 100),
           ("azuze", "Brand#1", "STANDARD", 1, 100),
           ("rose", "Brand#2", "ECONOMY", 2, 100)]
)
def test_plan_oracle_parity_on_adversarial_part(
    spark, tmp_path_factory, name, parts
):
    tmpdir = _write_part_dir(str(tmp_path_factory.mktemp("fuzzpart")), parts)
    spark_df = registry.queries()[name](spark, tmpdir)
    con = duckdb_connection(tmpdir)
    try:
        oracle_pdf = con.execute(registry.oracles()[name]).fetchdf()
    finally:
        con.close()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name} diverged on {parts!r}: {problems}"


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(events=events_strategy)
@example(events=[(0, "view", 0, 100)])  # singleton group: ~37% of
# replicates draw weight 0 — the small-n_replicates regime
@example(events=[(0, "view", 0, 100), (1, "view", 0, None)])
def test_bootstrap_interval_is_ordered(spark, tmp_path_factory, events):
    """Semantic invariant no oracle can check (both engines would agree
    on an inverted interval): ci_lo ≤ ci_hi on every group — the
    review-found inversion class (trimming indexes crossing at tiny
    surviving-replicate counts).  Deliberately NOT asserted: that the
    sample mean lies inside the interval — percentile-bootstrap theory
    does not guarantee it for skewed groups."""
    tmpdir = _write_fixture_dir(str(tmp_path_factory.mktemp("fzbs")), events)
    for r in registry.queries()["q_bootstrap_ci"](spark, tmpdir).collect():
        assert r["ci_lo"] <= r["ci_hi"], r


# ---------------------------------------------------------------------------
# multimodal byte-stress: the payload path encodes documents.text's UTF-8
# BYTES into real containers (PPM rasters padded to 3-byte pixels / full
# rows, RIFF/PCM16 with 2-byte samples), so byte-level text shapes the word
# pool never produces — multi-byte UTF-8 (2/3/4-byte code points), control
# bytes incl. NUL, odd byte lengths straddling pixel/sample/row boundaries,
# and single long payloads — are their real adversarial surface (VERDICT r5
# item 6).  The five oracle-checked multimodal ids must stay PARITY-green
# (octet_length vs python len(bytes) vs numpy frombuffer all agree), and
# the rows-only kernels must run.
# ---------------------------------------------------------------------------

_BYTE_STRESS_ALPHABET = "a \x00\x01\x7fé中𐍈\n\t,"

byte_stress_text = st.text(alphabet=_BYTE_STRESS_ALPHABET, min_size=0, max_size=64)

multimodal_docs_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), byte_stress_text),
        st.one_of(st.none(), st.sampled_from(("en", "de"))),
        st.one_of(st.none(), st.sampled_from(("web", "wiki"))),
    ),
    min_size=0,
    max_size=9,
)

MULTIMODAL_ORACLE_QUERIES = (
    "q_multimodal_meta",
    "q_multimodal_decode",
    "q_multimodal_dedup",
    "q_multimodal_frames",
    "q_multimodal_pair",
)


@pytest.mark.parametrize("name", MULTIMODAL_ORACLE_QUERIES)
@settings(max_examples=4, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(docs=multimodal_docs_strategy)
@example(docs=[("\x00", "en", "web")])  # a single NUL byte payload
@example(docs=[("𐍈" * 17, "en", "web")])  # 68 bytes of 4-byte code points
@example(docs=[("é", None, None), ("中中", "de", "wiki")])  # 2B/3B points,
# byte lengths 2 and 6 — straddle the 3-byte-pixel boundary differently
@example(docs=[("a" * 49, "en", "web")])  # one byte past a full 16-px row
def test_multimodal_parity_on_byte_stress_documents(
    spark, tmp_path_factory, name, docs
):
    tmpdir = _write_documents_dir(str(tmp_path_factory.mktemp("fzmm")), docs)
    spark_df = registry.queries()[name](spark, tmpdir)
    con = duckdb_connection(tmpdir)
    try:
        oracle_pdf = con.execute(registry.oracles()[name]).fetchdf()
    finally:
        con.close()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name} diverged on {docs!r}: {problems}"


@pytest.mark.parametrize(
    "name", ("q_multimodal_resize", "q_multimodal_features", "q_multimodal_patches")
)
@settings(max_examples=3, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(docs=multimodal_docs_strategy)
@example(docs=[("\x00", "en", "web")])
@example(docs=[("𐍈" * 17, "en", "web")])
def test_multimodal_kernels_run_on_byte_stress_documents(
    spark, tmp_path_factory, name, docs
):
    tmpdir = _write_documents_dir(str(tmp_path_factory.mktemp("fzmk")), docs)
    _smoke(spark, name, tmpdir)


# ---------------------------------------------------------------------------
# Rows-only queries (no DuckDB oracle: sketches, randomized LSH, kernels).
# The driver only ever runs them on the FIXTURE; here they must RUN and
# keep a stable schema on the same adversarial corpora the oracle fuzz
# uses — empty corpora, NULL text/vectors, zero vectors, NULL metrics.
# This is precisely the class that produced the zero-norm ANSI crash and
# the np.frombuffer(None) Arrow kill in the oracle-backed queries.
# ---------------------------------------------------------------------------

ROWS_ONLY_EVENTS = ("q_agg_approx", "q_hll_rollup", "q_theta_overlap")
ROWS_ONLY_DOCS = (
    "q_dedup_incremental_minhash",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_decontaminate_fuzzy",
    "q_heavy_hitters",
    "q_quality_classifier",
    "q_multimodal_resize",
    "q_multimodal_features",
    "q_multimodal_patches",
)
ROWS_ONLY_EMB = (
    "q_dedup_semantic",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_sim_ann_ivfpq",
    "q_sim_ann_opq",
    "q_embedding_pca",
)
ROWS_ONLY_LINEITEM = ("q_agg_approx_quantile",)


def _smoke(spark, name, tmpdir):
    df = registry.queries()[name](spark, tmpdir)
    fixture_cols = registry.queries()[name](spark, SF_DIR).columns
    assert df.columns == fixture_cols, (name, df.columns, fixture_cols)
    df.collect()  # must execute without raising on the adversarial corpus


@pytest.mark.parametrize("name", ROWS_ONLY_EVENTS)
@settings(max_examples=3, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(events=events_strategy)
@example(events=[])
@example(events=[(0, "view", 0, None)])  # all-NULL metric
def test_rows_only_queries_run_on_adversarial_events(
    spark, tmp_path_factory, name, events
):
    tmpdir = _write_fixture_dir(str(tmp_path_factory.mktemp("fzre")), events)
    _smoke(spark, name, tmpdir)


@pytest.mark.parametrize("name", ROWS_ONLY_DOCS)
@settings(max_examples=3, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(docs=documents_strategy)
@example(docs=[])
@example(docs=[(None, "en", "web")])  # NULL text only
@example(docs=[("", "en", "web"), (None, None, None)])  # empty + NULL
def test_rows_only_queries_run_on_adversarial_documents(
    spark, tmp_path_factory, name, docs
):
    tmpdir = _write_documents_dir(str(tmp_path_factory.mktemp("fzrd")), docs)
    _smoke(spark, name, tmpdir)


@pytest.mark.parametrize("name", ROWS_ONLY_EMB)
@settings(max_examples=3, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(rows=embeddings_strategy)
@example(rows=[])
@example(rows=[(False, 0, None)])  # all-NULL embedding
@example(rows=[(False, 0, [0, 0, 0, 0])])  # lone zero vector
@example(rows=[(False, 0, None), (False, 1, [4, 0, 0, 0]),
               (True, 0, [0, 0, 0, 0])])  # NULL + zero + one real
def test_rows_only_queries_run_on_adversarial_embeddings(
    spark, tmp_path_factory, name, rows
):
    tmpdir = _write_embeddings_dir(str(tmp_path_factory.mktemp("fzrm")), rows)
    _smoke(spark, name, tmpdir)


@pytest.mark.parametrize("name", ROWS_ONLY_LINEITEM)
@settings(max_examples=3, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(rel=relational_strategy)
@example(rel=([], [], []))
@example(rel=([], [], [(0, 0, 0, 1, 100, 0, 0, "R", "O", 0)]))  # singleton
def test_rows_only_queries_run_on_adversarial_lineitem(
    spark, tmp_path_factory, name, rel
):
    tmpdir = _write_relational_dir(str(tmp_path_factory.mktemp("fzrl")), rel)
    _smoke(spark, name, tmpdir)
