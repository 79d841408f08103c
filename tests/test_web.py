"""Unit tests for the URL canonicalizer (operators/web.py) and plan-shape
pins for the llm_web query family."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from bifrost_spark import registry
from bifrost_spark.operators.web import canonicalize_url

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
