"""Gates for the streaming embedding-centroid drift monitor
(streaming/centroid_drift.py): exact batch parity with q_centroid_drift
on the same corpus split (the q_psi_drift pairing device), per-batch
differential equality when the drop arrives in multiple micro-batches,
and replay idempotence via the shared batch_id-partitioned sink.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bifrost_spark import registry
from bifrost_spark.streaming.centroid_drift import (
    batch_centroid_drift,
    fit_reference_centroids,
    start_centroid_drift,
)
from bifrost_spark.tables import load_table


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    """Reference = the standing corpus (vec_id % 4 != 0); stream = the new
    drop (vec_id % 4 == 0) — the exact split q_centroid_drift uses."""
    e = load_table(spark, sf_dir, "embeddings")
    ref = fit_reference_centroids(e.filter(F.col("vec_id") % 4 != 0))
    src = str(tmp_path / "src")
    e.filter(F.col("vec_id") % 4 == 0).coalesce(1).write.parquet(src)
    return e, ref, src


def _rows(df):
    return {(r["label"], r["n_cur"], r["drift"]) for r in df.collect()}


def test_single_batch_matches_batch_twin_exactly(spark, sf_dir, tmp_path, staged):
    """The whole drop in ONE micro-batch must reproduce q_centroid_drift's
    (label, n_cur, drift) rows with SET EQUALITY — same aggregation by
    construction, so no tolerance."""
    e, ref, src = staged
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = start_centroid_drift(stream, ref, out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = _rows(spark.read.parquet(out).select("label", "n_cur", "drift"))
    want = _rows(
        registry.queries()["q_centroid_drift"](spark, sf_dir).select(
            "label", "n_cur", "drift"
        )
    )
    assert got == want


def test_multi_batch_differential(spark, sf_dir, tmp_path, staged):
    """Drop split across micro-batches: each batch's emitted rows must
    equal batch_centroid_drift recomputed on exactly that batch's rows
    (file-source batches = one file each)."""
    e, ref, _ = staged
    drop = e.filter(F.col("vec_id") % 4 == 0)
    src = str(tmp_path / "msrc")
    # two deterministic halves, one file each → maxFilesPerTrigger=1 gives
    # two micro-batches with known membership
    drop.filter(F.col("vec_id") % 8 == 0).coalesce(1).write.parquet(src)
    drop.filter(F.col("vec_id") % 8 != 0).coalesce(1).write.mode("append").parquet(src)
    out, ckpt = str(tmp_path / "mout"), str(tmp_path / "mckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_centroid_drift(stream, ref, out, ckpt)
    q.processAllAvailable()
    q.stop()

    emitted = spark.read.parquet(out)
    batch_ids = [r["batch_id"] for r in emitted.select("batch_id").distinct().collect()]
    assert len(batch_ids) == 2
    # reconstruct each micro-batch's membership from its n_cur total: the
    # two halves have distinct label->count profiles, so match each batch
    # output against the recomputed half it equals — order of file pickup
    # is not contractual
    halves = [
        drop.filter(F.col("vec_id") % 8 == 0),
        drop.filter(F.col("vec_id") % 8 != 0),
    ]
    recomputed = [_rows(batch_centroid_drift(h, ref)) for h in halves]
    for bid in batch_ids:
        got = _rows(
            emitted.filter(F.col("batch_id") == bid).select("label", "n_cur", "drift")
        )
        assert got in recomputed
        recomputed.remove(got)


def test_replay_idempotence(spark, sf_dir, tmp_path, staged):
    """Re-emitting a batch id rewrites its partition instead of appending
    (the shared _sink protocol)."""
    e, ref, src = staged
    out = str(tmp_path / "rout")
    batch = spark.read.parquet(src)
    from bifrost_spark.streaming._sink import write_batch_partition

    write_batch_partition(batch_centroid_drift(batch, ref), 7, out)
    once = spark.read.parquet(out).count()
    write_batch_partition(batch_centroid_drift(batch, ref), 7, out)
    assert spark.read.parquet(out).count() == once
