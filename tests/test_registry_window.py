"""The external correctness gate samples the first 50 entries of queries().

These tests pin the window contract: every name in CHECK_PRIORITY must be a
real registered query (a typo would silently shrink the prioritized window),
and the first 50 iteration entries must be exactly CHECK_PRIORITY so the
driver checks the queries this round targets.
"""

from bifrost_spark import registry

WINDOW = 50

# SURVEY §2 declared ids that had no driver CORRECTNESS row in round 1.
DECLARED_UNCHECKED = {
    "q_topic_discovery",
    "q_topic_filter",
    "q_partition_demux",
    "q_offset_bounds",
    "q_tumbling_window",
    "q_session_window",
    "q_object_keys",
    "q_commit_offsets",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_text_stats",
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


def test_declared_unchecked_ids_inside_window():
    window = set(list(registry.queries())[:WINDOW])
    assert DECLARED_UNCHECKED <= window
