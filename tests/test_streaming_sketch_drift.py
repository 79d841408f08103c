"""Gates for the streaming quantile-sketch drift monitor
(streaming/sketch_drift.py): exact batch parity with q_sketch_drift on
the same week split (the centroid-drift pairing device), per-batch
differential equality when scoring days arrive in multiple micro-batches,
and replay idempotence via the shared batch_id-partitioned sink.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bifrost_spark import registry
from bifrost_spark.streaming.sketch_drift import (
    batch_sketch_drift,
    fit_baseline_sketch,
    start_sketch_drift,
)
from bifrost_spark.tables import load_table


def _min_week(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        e.agg(F.min(F.date_trunc("week", "ts").cast("date")).alias("w"))
        .collect()[0]["w"]
    )


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    """Baseline = the minimum week's events; stream = every later day —
    the exact split q_sketch_drift uses."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wk = F.date_trunc("week", "ts").cast("date")
    w0 = _min_week(spark, sf_dir)
    baseline = fit_baseline_sketch(e.filter(wk == F.lit(w0)))
    scoring = e.filter(wk > F.lit(w0))
    src = str(tmp_path / "src")
    scoring.coalesce(1).write.parquet(src)
    return scoring, baseline, src


def _rows(df):
    return {
        (r["day"], r["n_day"], r["n_base"], r["ks_d"], r["alarm"])
        for r in df.collect()
    }


def test_single_batch_matches_batch_twin_exactly(spark, sf_dir, tmp_path, staged):
    """All scoring days in ONE micro-batch must reproduce q_sketch_drift's
    (day, n_day, n_base, ks_d, alarm) rows with SET EQUALITY — the batch
    sketches and the scoring reduction are the SAME shared helpers, so no
    tolerance."""
    scoring, baseline, src = staged
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = start_sketch_drift(stream, baseline, out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = _rows(
        spark.read.parquet(out).select("day", "n_day", "n_base", "ks_d", "alarm")
    )
    want = _rows(registry.queries()["q_sketch_drift"](spark, sf_dir))
    assert got == want


def test_multi_batch_differential(spark, sf_dir, tmp_path, staged):
    """Scoring days split across micro-batches (one file each): each
    batch's emitted rows must equal batch_sketch_drift recomputed on
    exactly that batch's rows.  Days are whole within a batch, so every
    per-day KS row is identical to the single-batch case."""
    scoring, baseline, _ = staged
    src = str(tmp_path / "msrc")
    half_a = scoring.filter(F.dayofmonth("ts") % 2 == 0)
    half_b = scoring.filter(F.dayofmonth("ts") % 2 != 0)
    half_a.coalesce(1).write.parquet(src)
    half_b.coalesce(1).write.mode("append").parquet(src)
    out, ckpt = str(tmp_path / "mout"), str(tmp_path / "mckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_sketch_drift(stream, baseline, out, ckpt)
    q.processAllAvailable()
    q.stop()

    emitted = spark.read.parquet(out)
    batch_ids = [
        r["batch_id"] for r in emitted.select("batch_id").distinct().collect()
    ]
    assert len(batch_ids) == 2
    recomputed = [
        _rows(batch_sketch_drift(h, baseline)) for h in (half_a, half_b)
    ]
    for bid in batch_ids:
        got = _rows(
            emitted.filter(F.col("batch_id") == bid).select(
                "day", "n_day", "n_base", "ks_d", "alarm"
            )
        )
        assert got in recomputed
        recomputed.remove(got)
    # whole days per batch → the union of batch outputs IS the batch twin
    got_all = _rows(
        emitted.select("day", "n_day", "n_base", "ks_d", "alarm")
    )
    assert got_all == _rows(registry.queries()["q_sketch_drift"](spark, sf_dir))


def test_replay_idempotence(spark, sf_dir, tmp_path, staged):
    """Re-emitting a batch id rewrites its partition instead of appending
    (the shared _sink protocol)."""
    scoring, baseline, src = staged
    out = str(tmp_path / "rout")
    batch = spark.read.parquet(src)
    from bifrost_spark.streaming._sink import write_batch_partition

    write_batch_partition(batch_sketch_drift(batch, baseline), 3, out)
    once = spark.read.parquet(out).count()
    write_batch_partition(batch_sketch_drift(batch, baseline), 3, out)
    assert spark.read.parquet(out).count() == once
