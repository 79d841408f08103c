"""Unit tests for the URL canonicalizer (operators/web.py) and plan-shape
pins for the llm_web query family."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from bifrost_spark import registry
from bifrost_spark.operators.web import canonicalize_url
from bifrost_spark.queries.llm_web import PARA_WORDS

CASES = [
    # scheme case + fragment + default https port + www + trailing slash
    ("HTTPS://WWW.Example.COM:443/a/b/#frag", "example.com/a/b"),
    ("http://example.com:80/a/b", "example.com/a/b"),
    # non-default port survives
    ("http://example.com:8080/x", "example.com:8080/x"),
    # tracking params dropped, remaining params sorted
    ("https://e.com/p?utm_source=rss&b=2&a=1&ref=feed", "e.com/p?a=1&b=2"),
    ("https://e.com/p?a=1&b=2", "e.com/p?a=1&b=2"),
    # all params tracking → no '?' at all
    ("https://e.com/p?utm_campaign=x&gclid=1&fbclid=2", "e.com/p"),
    # no path, no query
    ("https://www.e.com", "e.com"),
    ("https://www.e.com/", "e.com"),
    # scheme-less input
    ("www.e.com/x?b=2&a=1", "e.com/x?a=1&b=2"),
    # host case folds, path case preserved
    ("https://E.COM/CaseSensitivePath", "e.com/CaseSensitivePath"),
    # 'ref' is tracking but 'referrer' is not (anchored param-name match)
    ("https://e.com/p?referrer=x&ref=y", "e.com/p?referrer=x"),
    # www only stripped as a leading label
    ("https://notwww.e.com/x", "notwww.e.com/x"),
    # empty query string → no '?'
    ("https://e.com/p?", "e.com/p"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i int, url string")
    got = {
        r["i"]: r["canon"]
        for r in df.select("i", canonicalize_url(F.col("url")).alias("canon")).collect()
    }
    for i, (url, want) in enumerate(CASES):
        assert got[i] == want, f"{url!r}: got {got[i]!r}, want {want!r}"


def test_canonicalize_url_is_idempotent(spark):
    """canon(canon(u)) == canon(u) — canonical forms are fixed points."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    rows = df.select(
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"]


def _plan(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        registry.queries()[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    # formatted explain lists each node twice (tree + detail header);
    # count the "(n) Exchange" detail headers only
    return sum(
        1 for l in plan.splitlines() if l.strip().startswith("(") and ") Exchange" in l
    )


def test_url_dedup_plan_is_single_hash_agg(spark, sf_dir):
    """URL dedup must be scan → partial agg → exchange → final agg: no
    window (would disable map-side combine), no Python, one shuffle."""
    plan = _plan(spark, sf_dir, "q_url_dedup")
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert _n_exchanges(plan) == 1, plan
    # only the two needed columns reach the scan
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and "text" not in read[0], "unreferenced text column not pruned"


def test_dedup_paragraph_plan_shape(spark, sf_dir):
    """Paragraph dedup: one window shuffle (keep-first per paragraph) +
    one aggregation shuffle (doc reassembly); everything JVM-side."""
    plan = _plan(spark, sf_dir, "q_dedup_paragraph")
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert _n_exchanges(plan) <= 2, plan


def test_dedup_paragraph_edge_cases(spark, tmp_path):
    """Crafted corpus: doc 1 duplicates doc 0 entirely (loses ALL
    paragraphs → empty clean_text), doc 2 shares one paragraph, doc 3 is
    shorter than one paragraph, an empty doc is excluded."""
    import pandas as pd

    p0 = " ".join(f"w{i}" for i in range(PARA_WORDS))
    p1 = " ".join(f"x{i}" for i in range(PARA_WORDS))
    p2 = " ".join(f"y{i}" for i in range(5))  # short tail paragraph
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                f"{p0} {p1}",   # doc 0: both kept (first occurrence)
                f"{p0} {p1}",   # doc 1: exact copy → loses everything
                f"{p1} {p2}",   # doc 2: loses p1, keeps p2... but p1 is
                                # doc 2's FIRST para (position 0) and was
                                # first seen in doc 0 → dropped
                p2,             # doc 3: single short para — dup of doc 2's tail
                "",             # doc 4: empty → excluded from output
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [0] * 5,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    from bifrost_spark import registry

    out = {
        r["doc_id"]: r
        for r in registry.queries()["q_dedup_paragraph"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert (out[0]["n_paras"], out[0]["n_kept"]) == (2, 2)
    assert out[0]["clean_text"] == f"{p0} {p1}"
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 0)
    assert out[1]["clean_text"] == ""
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
    assert out[2]["clean_text"] == p2
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (1, 0)


def test_url_dedup_keeps_min_doc_and_counts(spark, tmp_path):
    """Ten docs collapsing to two canonical URLs (doc_id%25 ∈ {0,5} by
    construction when ids are 0,5,25,30,50...): kept doc is the min id
    and n_dups partitions the corpus."""
    import pandas as pd

    ids = [0, 5, 25, 30, 50, 55, 75, 80, 100, 105]
    docs = pd.DataFrame(
        {
            "doc_id": ids,
            "text": ["t"] * 10,
            "lang": ["en"] * 10,
            "source": ["same"] * 10,
            "n_chars": [1] * 10,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    from bifrost_spark import registry

    rows = registry.queries()["q_url_dedup"](spark, str(tmp_path)).collect()
    by_url = {r["canonical_url"]: r for r in rows}
    assert len(by_url) == 2
    assert sum(r["n_dups"] for r in rows) == 10
    for r in rows:
        assert r["doc_id"] in (0, 5)
        assert r["canonical_url"].startswith("same.example.com/a/")
        assert "?x=1&y=2" in r["canonical_url"]
        assert "utm" not in r["canonical_url"] and "ref" not in r["canonical_url"]


# ---- differential property test: Python reference model vs JVM chain ----

import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TRACK = _re.compile(r"^(utm_[a-z]+|ref|fbclid|gclid)=")


def _canon_model(url: str) -> str:
    """Independent Python spelling of operators/web.py's contract."""
    bare = _re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "", url)
    bare = _re.sub(r"#.*$", "", bare)
    hostpath, _, q = bare.partition("?")
    host = _re.sub(r"/.*$", "", hostpath).lower()
    host = _re.sub(r"^www\.", "", host)
    host = _re.sub(r":(80|443)$", "", host)
    path = hostpath[hostpath.index("/"):] if "/" in hostpath else ""
    path = _re.sub(r"/$", "", path)
    kept = sorted(p for p in q.split("&") if p and not _TRACK.match(p))
    return host + path + ("?" + "&".join(kept) if kept else "")


_label = st.text("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-", min_size=1, max_size=8)
_param = st.one_of(
    st.tuples(st.sampled_from(["a", "b", "zz", "id", "referrer"]), _label),
    st.tuples(st.sampled_from(["utm_source", "utm_campaign", "ref", "fbclid", "gclid"]), _label),
)
_url_parts = st.tuples(
    st.sampled_from(["", "http://", "https://", "HTTPS://", "FTP://"]),
    st.booleans(),  # www.
    st.lists(_label, min_size=1, max_size=3),  # host labels
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(_label, min_size=0, max_size=3),  # path segments
    st.booleans(),  # trailing slash
    st.lists(_param, min_size=0, max_size=4),
    st.sampled_from(["", "#frag", "#a?b=1"]),
)


def _mk_url(parts) -> str:
    scheme, www, hlabels, port, psegs, tslash, params, frag = parts
    host = ("www." if www else "") + ".".join(hlabels)
    path = "".join("/" + s for s in psegs)
    if tslash and path:
        path += "/"
    q = "&".join(f"{k}={v}" for k, v in params)
    return scheme + host + port + path + ("?" + q if params else "") + frag


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_url_parts, min_size=1, max_size=12))
def test_canonicalize_url_matches_python_model(spark, parts_list):
    urls = [_mk_url(p) for p in parts_list]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _canon_model(u), f"{u!r}: jvm={got[i]!r} model={_canon_model(u)!r}"


# ---- paragraph-dedup differential property test ----

def _para_model(docs):
    """Python reference for q_dedup_paragraph: (doc_id -> (n_paras,
    n_kept, clean_text)) with corpus-wide keep-first by (doc_id, idx)."""
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        words = [w for w in text.lower().split(" ") if w]
        if not words:
            continue
        paras = [
            " ".join(words[s : s + PARA_WORDS])
            for s in range(0, len(words), PARA_WORDS)
        ]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[doc_id] = (len(paras), len(kept), " ".join(kept))
    return out


_words = st.sampled_from([f"w{i}" for i in range(12)])
_doc_text = st.lists(_words, min_size=0, max_size=70).map(" ".join)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc_text, min_size=1, max_size=10))
def test_dedup_paragraph_matches_python_model(spark, tmp_path_factory, texts):
    """Random word-soup corpora (tiny vocabulary → frequent cross-doc
    paragraph collisions) must match the keep-first reference model."""
    import pandas as pd

    from bifrost_spark import registry

    tmp = tmp_path_factory.mktemp("paras")
    docs = list(enumerate(texts))
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(tmp / "documents.parquet", index=False)
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
        for r in registry.queries()["q_dedup_paragraph"](spark, str(tmp)).collect()
    }
    assert got == _para_model(docs)
