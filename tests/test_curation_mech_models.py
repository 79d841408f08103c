"""Triple-entry verification, tranche 14: deterministic-hash curation
mechanics.

The engine's reproducible sampling/splitting/dedup machinery is built on
md5 buckets and integer hash walks; engine and oracle share one spelling
of each derivation, so a mis-derived bucket (the round-3 ascii-mod
collapse class) passes parity on both.  Each test re-derives the
mechanics with hashlib / plain integer arithmetic: split thresholds,
stratified keep-sets, content-bucket mixtures, embargo boundaries,
negative-sampling draw walks, per-domain caps, normalized fingerprints,
the hashing trick's bucket decode, Morton-bit interleaves, and URL
canonicalization string surgery.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd
import pytest

from bifrost_spark import registry
from conftest import SF_DIR

TOL = 1e-6


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# splits
# ---------------------------------------------------------------------------


def test_dataset_split_matches_hashlib_thresholds(spark, docs):
    rows = registry.queries()["q_dataset_split"](spark, SF_DIR).collect()
    got = {r["doc_id"]: r["split"] for r in rows}
    assert len(got) == len(docs)
    for did in docs.doc_id:
        b = _md5(str(int(did)))[:2]
        want = "train" if b < "e6" else "val" if b < "f3" else "test"
        assert got[did] == want


def test_dataset_split_grouped_matches_hashlib_thresholds(spark, docs):
    rows = registry.queries()["q_dataset_split_grouped"](spark, SF_DIR).collect()
    got = {r["doc_id"]: r["split"] for r in rows}
    for did, src in zip(docs.doc_id, docs.source):
        if src is None:
            want = "test"  # md5(NULL) is NULL; both CASE arms fall through
        else:
            b = _md5(src)[:2]
            want = "train" if b < "e6" else "val" if b < "f3" else "test"
        assert got[did] == want
    # the split really is group-pure: one split per source
    by_src = {}
    for did, src in zip(docs.doc_id, docs.source):
        by_src.setdefault(src, set()).add(got[did])
    assert all(len(s) == 1 for s in by_src.values())


def test_stratified_sample_matches_hashlib_keepsets(spark, events):
    rates = {"view": "051e", "click": "1999", "purchase": None}
    want = set()
    for eid, et in zip(events.event_id, events.event_type):
        hi = rates.get(et, "skip")
        if hi == "skip":
            continue
        if hi is None or _md5(str(int(eid)))[:4] < hi:
            want.add(eid)
    rows = registry.queries()["q_stratified_sample"](spark, SF_DIR).collect()
    assert {r["event_id"] for r in rows} == want
    # sanity on the engine-side thresholds: 2% and 10% of 65536
    assert rates["view"] == format(int(0.02 * 65536), "04x")
    assert rates["click"] == format(int(0.10 * 65536), "04x")


def test_sample_mixture_matches_content_buckets(spark, docs):
    want = set()
    for did, text, lang in zip(docs.doc_id, docs.text, docs.lang):
        if text is None:
            continue  # md5(NULL-concat) is NULL; the filter drops the row
        h = _md5(f"{int(did)}:{text}")
        bucket = (ord(h[0]) * 256 + ord(h[1])) % 100
        rate = 80 if lang == "en" else 50 if lang == "zh" else 25
        if bucket < rate:
            want.add(did)
    rows = registry.queries()["q_sample_mixture"](spark, SF_DIR).collect()
    assert {r["doc_id"] for r in rows} == want


def test_temporal_split_matches_embargo_boundaries(spark, events):
    t1 = pd.Timestamp("2024-01-20 00:00:00")
    t2 = pd.Timestamp("2024-01-22 00:00:00")
    want = {}
    for eid, ts in zip(events.event_id, events.ts):
        if ts < t1:
            want[eid] = "train"
        elif ts >= t2:
            want[eid] = "test"
    rows = registry.queries()["q_temporal_split"](spark, SF_DIR).collect()
    assert {r["event_id"]: r["split"] for r in rows} == want


# ---------------------------------------------------------------------------
# sampling / caps
# ---------------------------------------------------------------------------


def test_negative_sampling_matches_integer_walk(spark, orders):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n_parts = len(pd.read_parquet(f"{SF_DIR}/part.parquet"))
    inter = set(
        zip(
            li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").o_custkey,
            li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").l_partkey,
        )
    )
    A, B, M = 2654435761, 40503, 4294967296
    want = set()
    for c in cust.c_custkey:
        c = int(c)
        first_draw = {}
        for i in range(20):
            p = (c * A + i * B) % M % n_parts
            if p not in first_draw:
                first_draw[p] = i
        survivors = sorted(
            ((i, p) for p, i in first_draw.items() if (c, p) not in inter)
        )
        for rnk, (i, p) in enumerate(survivors[:5], start=1):
            want.add((c, p, rnk))
    rows = registry.queries()["q_negative_sampling"](spark, SF_DIR).collect()
    got = {(r["c_custkey"], r["part_key"], r["rnk"]) for r in rows}
    assert got == want


def test_domain_cap_matches_md5_order(spark, docs):
    want = set()
    for src, grp in docs.groupby("source", dropna=False):
        key = None if pd.isna(src) else src
        order = sorted(
            (( _md5(str(int(d))), int(d)) for d in grp.doc_id)
        )
        for rnk, (_, d) in enumerate(order[:15], start=1):
            want.add((d, key, rnk))
    rows = registry.queries()["q_domain_cap"](spark, SF_DIR).collect()
    got = {(r["doc_id"], r["source"], r["cap_rank"]) for r in rows}
    assert got == want


# ---------------------------------------------------------------------------
# content hashing
# ---------------------------------------------------------------------------


def test_fingerprint_matches_normalized_md5(spark, docs):
    rows = registry.queries()["q_fingerprint"](spark, SF_DIR).collect()
    got = {r["doc_id"]: (r["fingerprint"], r["norm_len"]) for r in rows}
    assert len(got) == len(docs)
    for did, text in zip(docs.doc_id, docs.text):
        if text is None:
            assert got[did] == (None, None)
        else:
            norm = re.sub(" +", " ", text.lower())
            assert got[did] == (_md5(norm), len(norm))


def test_dedup_exact_matches_hash_groups(spark, docs):
    groups: dict = {}
    for did, text in zip(docs.doc_id, docs.text):
        key = None if text is None else _md5(text)
        g = groups.setdefault(key, [0, None])
        g[0] += 1
        g[1] = int(did) if g[1] is None else min(g[1], int(did))
    rows = registry.queries()["q_dedup_exact"](spark, SF_DIR).collect()
    got = {r["text_hash"]: (r["n_copies"], r["keeper_doc_id"]) for r in rows}
    assert got == {k: (n, keeper) for k, (n, keeper) in groups.items()}


def test_feature_hash_matches_decoded_buckets(spark, docs):
    want: Counter = Counter()
    for did, text in zip(docs.doc_id, docs.text):
        if text is None:
            continue
        for t in text.lower().split(" "):
            if t != "":
                want[(did, int(_md5(t)[:2], 16) % 64)] += 1
    rows = registry.queries()["q_feature_hash"](spark, SF_DIR).collect()
    got = {(r["doc_id"], r["bucket"]): r["n"] for r in rows}
    assert got == dict(want)


# ---------------------------------------------------------------------------
# layout / URL surgery
# ---------------------------------------------------------------------------


def test_zorder_matches_python_bit_interleave(spark, orders):
    rows = registry.queries()["q_zorder"](spark, SF_DIR).collect()
    got = {r["o_orderkey"]: (r["x"], r["y"], r["zkey"]) for r in rows}
    for ok, ck, od in zip(orders.o_orderkey, orders.o_custkey, orders.o_orderdate):
        x = int(ck) % 256
        y = pd.Timestamp(od).dayofyear % 256
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        assert got[ok] == (x, y, z)


def _canonicalize(url: str) -> str:
    bare = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "", url)
    bare = re.sub(r"#.*$", "", bare)
    if "?" in bare:
        hostpath, q = bare.split("?", 1)
    else:
        hostpath, q = bare, ""
    if "/" in hostpath:
        host, path = hostpath.split("/", 1)
        path = "/" + path
    else:
        host, path = hostpath, ""
    host = re.sub(r":(80|443)$", "", re.sub(r"^www\.", "", host.lower()))
    path = re.sub(r"/$", "", path)
    keep = sorted(
        t
        for t in q.split("&")
        if t != "" and not re.match(r"^(utm_[a-z]+|ref|fbclid|gclid)=", t)
    )
    cq = "&".join(keep)
    return host + path + ("?" + cq if cq else "")


def test_url_dedup_matches_python_canonicalizer(spark, docs):
    def build(did, src):
        did = int(did)
        return (
            ("https://" if did % 2 == 0 else "HTTPS://")
            + ("www." if did % 3 == 0 else "")
            + (src.upper() if did % 7 == 0 else src)
            + ".example.com"
            + (":443" if did % 5 == 0 else "")
            + "/a/"
            + str(did % 25)
            + ("/" if did % 2 == 1 else "")
            + ("?x=1&y=2&utm_source=rss" if did % 2 == 0 else "?y=2&ref=feed&x=1")
            + ("#top" if did % 4 == 0 else "")
        )

    groups: dict = {}
    for did, src in zip(docs.doc_id, docs.source):
        cu = _canonicalize(build(did, src))
        g = groups.setdefault(cu, [0, None])
        g[0] += 1
        g[1] = int(did) if g[1] is None else min(g[1], int(did))
    rows = registry.queries()["q_url_dedup"](spark, SF_DIR).collect()
    got = {r["canonical_url"]: (r["n_dups"], r["doc_id"]) for r in rows}
    assert got == {k: (n, keeper) for k, (n, keeper) in groups.items()}
