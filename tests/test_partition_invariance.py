"""Partition-layout invariance sweep over the driver check window.

The determinism discipline (DECIMAL accumulation, integer-operand single
divisions, explicit tie-breaks, canonicalized signs) claims every checked
query returns the SAME multiset of rows regardless of physical layout —
the property that makes sf0.01 hash-parity evidence transfer to a
1000-executor cluster, where partition counts and reduction orders differ
from local[32].

This test runs every CHECK_PRIORITY query twice — shuffle partitions 3
vs 17 (odd, co-prime, both ≠ the suite's 8) — and requires bit-identical
sorted rows.  A query whose floats wobble with partition count would pass
a single-layout DuckDB compare and still flake on the cluster; it fails
here instead.  (Generalizes round-4's classifier-specific invariance
test to the whole window.)
"""

from __future__ import annotations

import math

import pytest

from bifrost_spark import registry


def _canon(df):
    rows = df.collect()
    out = []
    for r in rows:
        vals = []
        for v in r:
            # NaN != NaN would defeat the equality; normalize it
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(registry.CHECK_PRIORITY))
def test_window_query_invariant_to_shuffle_partitioning(spark, sf_dir, name):
    fn = registry.queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _canon(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _canon(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert len(a) == len(b), f"{name}: row count varies with layout"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert not mismatches, f"{name}: rows vary with shuffle layout: {mismatches}"
