"""Property gates for the pipeline-ops family beyond the DuckDB oracle:
the oracle proves cross-engine parity on the fixture; these prove the
operators' SEMANTIC claims on adversarial inputs — the skyline window
really is the dominance relation, transition rows really are conditional
distributions, the packing really respects its bin bound, and the KS
statistic really is the classic formula.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bifrost_spark import registry
from bifrost_spark.queries.pipeline_ops import _COMPACT_TARGET

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Pareto frontier ≡ brute-force dominance on random point sets


_points = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),  # (size, price)
    min_size=1,
    max_size=40,
)


def _brute_frontier(pts):
    """Non-dominated (maximize size, minimize price); duplicates keep the
    lowest id, matching the operator's declared tie order."""
    out = []
    for i, (sz, pr) in enumerate(pts):
        dominated = False
        for j, (sz2, pr2) in enumerate(pts):
            strictly_better = (sz2 > sz and pr2 <= pr) or (sz2 >= sz and pr2 < pr)
            duplicate_earlier = sz2 == sz and pr2 == pr and j < i
            if strictly_better or duplicate_earlier:
                dominated = True
                break
        if not dominated:
            out.append(i)
    return sorted(out)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_points)
def test_pareto_window_equals_brute_force(spark, pts):
    pdf = pd.DataFrame(
        [(i, sz, float(pr)) for i, (sz, pr) in enumerate(pts)],
        columns=["p_partkey", "p_size", "price"],
    )
    df = spark.createDataFrame(pdf)
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.desc("p_size"), F.asc("price"), F.asc("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = sorted(
        r["p_partkey"]
        for r in df.withColumn("best", F.min("price").over(w))
        .filter(F.col("best").isNull() | (F.col("price") < F.col("best")))
        .collect()
    )
    assert got == _brute_frontier(pts)


# ---------------------------------------------------------------------------
# Markov transitions: each from_type row set is a probability distribution
# and the counts reconstruct the margins


def test_markov_rows_are_distributions(spark):
    rows = registry.queries()["q_markov_transitions"](spark, SF).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    assert by_from, "no transitions on fixture"
    for ft, rs in by_from.items():
        n_from = sum(r["n"] for r in rs)
        # p_next is round(n/n_from, 9): reconstruct and compare exactly
        for r in rs:
            assert r["p_next"] == round(r["n"] / n_from, 9), (ft, r)
        assert abs(sum(r["p_next"] for r in rs) - 1.0) < 1e-6, ft


# ---------------------------------------------------------------------------
# Compaction plan: bins are contiguous in packing order, every bin except
# possibly the last closes at/above the target minus one max file, and no
# file is lost


def test_compaction_plan_invariants(spark):
    rows = registry.queries()["q_compaction_plan"](spark, SF).collect()
    assert len(rows) == 500  # every manifest row planned exactly once
    assert len({r["file_id"] for r in rows}) == 500
    # recompute the packing order and check bin = floor(cum_before/target)
    ordered = sorted(rows, key=lambda r: (-r["bytes"], r["file_id"]))
    cum = 0
    for r in ordered:
        assert r["bin"] == cum // _COMPACT_TARGET, r
        cum += r["bytes"]
    # bin ids are dense 0..max
    bins = sorted({r["bin"] for r in rows})
    assert bins == list(range(len(bins)))


# ---------------------------------------------------------------------------
# KS statistic ≡ scipy-free reference implementation on the fixture


def test_ks_matches_reference_formula(spark):
    from bifrost_spark.tables import load_table

    e = load_table(spark, SF, "events").select("ts", "value").collect()
    split = pd.Timestamp("2024-01-16")
    a = sorted(r["value"] for r in e if pd.Timestamp(r["ts"]) < split)
    b = sorted(r["value"] for r in e if pd.Timestamp(r["ts"]) >= split)
    xs = sorted(set(a) | set(b))
    import bisect

    best = 0.0
    for x in xs:
        fa = bisect.bisect_right(a, x) / len(a)
        fb = bisect.bisect_right(b, x) / len(b)
        best = max(best, abs(fa - fb))
    got = registry.queries()["q_ks_drift"](spark, SF).first()
    assert math.isclose(got["ks_d"], best, abs_tol=1e-9)
    assert got["n_a"] == len(a) and got["n_b"] == len(b)


# ---------------------------------------------------------------------------
# PPJoin ≡ brute-force Jaccard on random corpora — guards the optimized
# spelling (hashed shingles, prefix pruning, positional plan hazards): the
# verified pair set must equal the naive definition on adversarial inputs


_vocab = [f"w{i}" for i in range(12)]
_doc = st.lists(st.sampled_from(_vocab), min_size=3, max_size=14).map(" ".join)


def _brute_ppjoin(texts):
    def shingles(t):
        ws = [w for w in t.lower().split(" ") if w]
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(texts) if shingles(t)}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter * 2 >= union:
                out[(a, b)] = inter
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=2, max_size=12))
def test_ppjoin_equals_brute_force(spark, tmp_path_factory, texts):
    d = tmp_path_factory.mktemp("pp")
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    rows = registry.queries()["q_jaccard_ppjoin"](spark, str(d)).collect()
    got = {(r["id_a"], r["id_b"]): r["n_common"] for r in rows}
    assert got == _brute_ppjoin(texts)
