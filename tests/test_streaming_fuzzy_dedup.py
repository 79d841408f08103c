"""Gates for the streaming MinHash near-dup admission flow
(streaming/fuzzy_dedup.py): batch parity with q_dedup_incremental_minhash
on the same corpus split, verdict completeness (every streamed doc gets
exactly one row), and replay idempotence of the batch_id-partitioned sink.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bifrost_spark import registry
from bifrost_spark.streaming.fuzzy_dedup import (
    build_signature_index,
    start_fuzzy_dedup,
)
from bifrost_spark.tables import load_table


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    """Index = the standing corpus (doc_id % 4 != 0); stream = the new
    drop (doc_id % 4 == 0) — the exact split the batch twin uses."""
    d = load_table(spark, sf_dir, "documents")
    index = build_signature_index(
        d.filter(F.col("doc_id") % 4 != 0)
    ).localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    d.filter(F.col("doc_id") % 4 == 0).coalesce(1).write.parquet(src)
    return d, index, src


def test_streaming_verdicts_match_batch_twin(spark, sf_dir, tmp_path, staged):
    d, index, src = staged
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_fuzzy_dedup(stream, index, out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    n_new = d.filter(F.col("doc_id") % 4 == 0).count()
    # verdict completeness: every streamed doc appears exactly once
    assert got.count() == n_new
    assert got.select("doc_id").distinct().count() == n_new

    flagged = {
        (r["doc_id"], r["dup_of"], r["est_jaccard"])
        for r in got.filter(F.col("dup_of").isNotNull()).collect()
    }
    batch_pairs = {
        (r["doc_id"], r["dup_of"], r["est_jaccard"])
        for r in registry.queries()["q_dedup_incremental_minhash"](
            spark, sf_dir
        ).collect()
    }
    # the stream keeps only each doc's BEST match; the batch twin emits
    # every over-threshold pair — so the streaming verdicts must be a
    # subset, and the set of FLAGGED docs must agree exactly
    assert flagged <= batch_pairs, flagged - batch_pairs
    assert {f[0] for f in flagged} == {p[0] for p in batch_pairs}
    assert flagged, "fixture split produced no near-dups — test is vacuous"


def test_probe_join_never_shuffles_the_index(spark, sf_dir):
    """The SCALE claim on lsh_probe_pairs/fuzzy_dedup, proven on real
    plans in BOTH regimes:

    * small drop (the common case): the probe side BROADCASTS into the
      index scan — the standing corpus's signatures never move;
    * drop too big to broadcast (autoBroadcast disabled): the index
      persisted bucketed by (band, bucket) (io.py::write_bucketed_table)
      satisfies the join's required distribution from the scan, so the
      sort-merge join plans NO exchange on the index side — only the
      probe side shuffles."""
    from bifrost_spark.io import write_bucketed_table
    from bifrost_spark.streaming.fuzzy_dedup import build_signature_index, probe_batch
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    probe = d.filter(F.col("doc_id") % 4 == 0)
    idx = build_signature_index(d.filter(F.col("doc_id") % 4 != 0))

    # regime 1: small inputs → the (band, bucket) probe join is a
    # broadcast hash join (locally EITHER side may be the build side; at
    # scale the daily drop is the small one), so neither side pays a
    # shuffle for the join itself
    plan = (
        probe_batch(probe, idx.localCheckpoint(eager=True))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin [band" in plan, plan

    # regime 2: broadcast off → the bucketed index side must shuffle-skip
    write_bucketed_table(
        idx, "fuzzy_index_bucketed", ("band", "bucket"), num_buckets=8
    )
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        index = spark.table("fuzzy_index_bucketed")
        n_bucketed = (
            probe_batch(probe, index)
            ._jdf.queryExecution().executedPlan().toString()
        ).count("Exchange hashpartitioning")
        n_plain = (
            probe_batch(probe, idx.localCheckpoint(eager=True))
            ._jdf.queryExecution().executedPlan().toString()
        ).count("Exchange hashpartitioning")
        assert n_bucketed < n_plain, (n_bucketed, n_plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
        spark.sql("DROP TABLE IF EXISTS fuzzy_index_bucketed")


def test_streaming_replay_is_idempotent(spark, tmp_path, staged):
    _, index, src = staged
    out = str(tmp_path / "out")
    schema = spark.read.parquet(src).schema

    q = start_fuzzy_dedup(
        spark.readStream.schema(schema).parquet(src),
        index,
        out,
        str(tmp_path / "ckpt1"),
    )
    q.processAllAvailable()
    q.stop()
    first = spark.read.parquet(out).count()

    # a FRESH checkpoint replays batch 0 from scratch: the dynamic
    # batch_id-partition overwrite must rewrite, not append
    q2 = start_fuzzy_dedup(
        spark.readStream.schema(schema).parquet(src),
        index,
        out,
        str(tmp_path / "ckpt2"),
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == first
