"""Triple-entry verification, tranche 13: temporal / sessionization /
dedup-graph operators.

Each operator is recomputed from first principles in plain Python —
explicit per-user event walks for attribution/SCD2/running-distinct,
min-timestamp frontier sets for the funnel, interval sweeps for
gaps-and-islands, union-find for near-dup connected components, and
direct set containment for the flow matrix — independent of both the
window-function spellings and the DuckDB oracles.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from bifrost_spark import registry
from conftest import SF_DIR

TOL = 1e-6


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _walks(events):
    """Per-user event list sorted by (ts, event_id)."""
    e = events.sort_values(["ts", "event_id"], kind="mergesort")
    return {uid: list(grp.itertuples()) for uid, grp in e.groupby("user_id", dropna=False)}


# ---------------------------------------------------------------------------
# q_attribution — explicit last-click walk
# ---------------------------------------------------------------------------


def test_attribution_matches_explicit_walk(spark, events):
    want = {}
    for _, walk in _walks(events).items():
        last_click = None
        for r in walk:
            if r.event_type == "click":
                last_click = r.event_id
            elif r.event_type == "purchase":
                want[r.event_id] = last_click
    rows = registry.queries()["q_attribution"](spark, SF_DIR).collect()
    got = {r["purchase_id"]: r["attributed_click_id"] for r in rows}
    assert got == want


# ---------------------------------------------------------------------------
# q_funnel — min-timestamp frontier sets
# ---------------------------------------------------------------------------


def test_funnel_matches_frontier_sets(spark, events):
    e = events
    v = e[e.event_type == "view"].groupby("user_id").ts.min()
    c_ev = e[e.event_type == "click"].merge(
        v.rename("t1"), left_on="user_id", right_index=True
    )
    c = c_ev[c_ev.ts >= c_ev.t1].groupby("user_id").ts.min()
    p_ev = e[e.event_type == "purchase"].merge(
        c.rename("t2"), left_on="user_id", right_index=True
    )
    p = p_ev[p_ev.ts >= p_ev.t2].groupby("user_id").ts.min()
    rows = registry.queries()["q_funnel"](spark, SF_DIR).collect()
    got = {r["stage"]: r["n_users"] for r in rows}
    assert got == {"view": len(v), "click": len(c), "purchase": len(p)}


# ---------------------------------------------------------------------------
# q_cohort_retention — explicit week arithmetic
# ---------------------------------------------------------------------------


def test_cohort_retention_matches_python_weeks(spark, events):
    e = events
    first = e.groupby("user_id").ts.min()
    cohort = {
        uid: (t.floor("D") - pd.to_timedelta(t.dayofweek, unit="D")).date()
        for uid, t in first.items()
    }
    cells: dict = {}
    for uid, ts in zip(e.user_id, e.ts):
        cw = cohort[uid]
        weeks = (ts.date() - cw).days // 7
        cells.setdefault((cw, weeks), set()).add(uid)
    rows = registry.queries()["q_cohort_retention"](spark, SF_DIR).collect()
    got = {
        (r["cohort_week"], r["weeks_since"]): r["active_users"] for r in rows
    }
    assert got == {k: len(s) for k, s in cells.items()}


# ---------------------------------------------------------------------------
# q_scd2 — explicit change-point walk
# ---------------------------------------------------------------------------


def test_scd2_matches_explicit_change_walk(spark, events):
    want = set()
    for uid, walk in _walks(events).items():
        changes = []
        prev = None
        for r in walk:
            if prev is None or r.event_type != prev:
                changes.append((r.event_type, r.ts))
            prev = r.event_type
        for i, (et, ts) in enumerate(changes):
            nxt = changes[i + 1][1] if i + 1 < len(changes) else None
            want.add((uid, et, ts, nxt))
    rows = registry.queries()["q_scd2"](spark, SF_DIR).collect()
    got = {
        (
            r["user_id"],
            r["event_type"],
            pd.Timestamp(r["valid_from"]),
            pd.Timestamp(r["valid_to"]) if r["valid_to"] is not None else None,
        )
        for r in rows
    }
    norm_want = {
        (u, et, pd.Timestamp(a), pd.Timestamp(b) if b is not None else None)
        for u, et, a, b in want
    }
    assert got == norm_want


# ---------------------------------------------------------------------------
# q_running_distinct — explicit prefix-set walk
# ---------------------------------------------------------------------------


def test_running_distinct_matches_prefix_sets(spark, events):
    want = {}
    for _, walk in _walks(events).items():
        seen: set = set()
        for r in walk:
            seen.add(r.event_type)
            want[r.event_id] = len(seen)
    rows = registry.queries()["q_running_distinct"](spark, SF_DIR).collect()
    got = {r["event_id"]: r["n_types_seen"] for r in rows}
    assert got == want


# ---------------------------------------------------------------------------
# q_interval_merge — explicit interval sweep (30-minute windows)
# ---------------------------------------------------------------------------


def test_interval_merge_matches_interval_sweep(spark, events):
    want = set()
    width = pd.Timedelta(minutes=30)
    for uid, walk in _walks(events).items():
        ivs = sorted((r.ts, r.ts + width) for r in walk)
        islands = []
        cs, ce, n = None, None, 0
        for s, e in ivs:
            if cs is None or s > ce:
                if cs is not None:
                    islands.append((cs, ce, n))
                cs, ce, n = s, e, 1
            else:
                ce = max(ce, e)
                n += 1
        islands.append((cs, ce, n))
        for idx, (s, e, n_ev) in enumerate(islands, start=1):
            want.add((uid, idx, s, e, n_ev))
    rows = registry.queries()["q_interval_merge"](spark, SF_DIR).collect()
    got = {
        (
            r["user_id"],
            r["island"],
            pd.Timestamp(r["island_start"]),
            pd.Timestamp(r["island_end"]),
            r["n_events"],
        )
        for r in rows
    }
    assert got == want


# ---------------------------------------------------------------------------
# q_dedup_cluster — union-find over brute-force Jaccard pairs
# ---------------------------------------------------------------------------


def test_dedup_cluster_matches_union_find(spark, docs):
    # char 10-gram distinct shingles, global df cap 50, J >= 0.5
    sh = {}
    for did, text in zip(docs.doc_id, docs.text):
        if text is None:
            continue
        n = len(text)
        sh[did] = {text[i : i + 10] for i in range(max(n - 9, 1))}
    df: Counter = Counter()
    for s in sh.values():
        df.update(s)
    sh = {did: {g for g in s if df[g] <= 50} for did, s in sh.items()}
    ids = sorted(sh)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= 0.5:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                edges += 1
    comp = {}
    in_pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= 0.5:
                in_pairs.add(a)
                in_pairs.add(b)
    for i in in_pairs:
        comp[i] = find(i)
    rows = registry.queries()["q_dedup_cluster"](spark, SF_DIR).collect()
    got = {r["id"]: r["component"] for r in rows}
    assert got == comp


# ---------------------------------------------------------------------------
# q_containment + q_dup_flow_matrix — direct directed set containment
# ---------------------------------------------------------------------------


def _containment_pairs_model(docs):
    sh = {}
    for did, text in zip(docs.doc_id, docs.text):
        if text is None:
            continue
        w = [t for t in text.lower().split(" ") if t != ""]
        sh[did] = {tuple(w[i : i + 3]) for i in range(len(w) - 2)}
    df: Counter = Counter()
    for s in sh.values():
        df.update(s)
    sh = {did: {g for g in s if df[g] <= 50} for did, s in sh.items()}
    pairs = {}
    ids = sorted(sh)
    for a in ids:
        n = len(sh[a])
        if n < 5:
            continue
        for b in ids:
            if a == b:
                continue
            nc = len(sh[a] & sh[b])
            if nc * 5 >= n * 4 and nc > 0:
                pairs[(a, b)] = (nc, nc / n)
    return pairs


def test_containment_matches_set_model(spark, docs):
    want = _containment_pairs_model(docs)
    rows = registry.queries()["q_containment"](spark, SF_DIR).collect()
    got = {
        (r["inner_id"], r["outer_id"]): (r["n_common"], r["containment"])
        for r in rows
    }
    assert set(got) == set(want)
    for k, (nc, c) in want.items():
        assert got[k][0] == nc
        assert abs(got[k][1] - c) < TOL


def test_dup_flow_matrix_matches_set_model(spark, docs):
    pairs = _containment_pairs_model(docs)
    src = dict(zip(docs.doc_id, docs.source))
    n_pairs: Counter = Counter()
    inner_docs: dict = {}
    for (a, b) in pairs:
        key = (src[a], src[b])
        n_pairs[key] += 1
        inner_docs.setdefault(key, set()).add(a)
    rows = registry.queries()["q_dup_flow_matrix"](spark, SF_DIR).collect()
    got = {
        (r["source_inner"], r["source_outer"]): (r["n_pairs"], r["n_inner_docs"])
        for r in rows
    }
    assert got == {
        k: (n_pairs[k], len(inner_docs[k])) for k in n_pairs
    }
