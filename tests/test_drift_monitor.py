"""Gates for the streaming drift monitor (streaming/drift_monitor.py):

1. batch_psi ≡ q_psi_drift's arithmetic: feeding the monitor the SAME
   cohort pair the batch query uses must reproduce the batch PSI exactly
   (the batch query is the oracle for the streaming twin — the repo's
   stream-vs-batch discipline, same as join.py's attribution join).
2. A live file-source run: micro-batches from an in-distribution cohort
   score low PSI / no alert; a crafted shifted batch trips the alert.
3. Restart idempotence: output is keyed by batch_id, so a monitor
   restarted from the checkpoint appends no duplicate rows.
"""

from __future__ import annotations

import glob
import time

import pytest
from pyspark.sql import functions as F

from bifrost_spark.streaming.drift_monitor import (
    PSI_ALERT,
    batch_psi,
    fit_reference,
    monitor_stream,
)
from bifrost_spark.tables import load_table

BIN_W, NBINS = 50.0, 10
SPLIT = "2024-01-16 00:00:00"


def test_batch_psi_matches_q_psi_drift(spark, sf_dir):
    from bifrost_spark import registry

    e = load_table(spark, sf_dir, "events")
    split = F.lit(SPLIT).cast("timestamp")
    ref = fit_reference(e.filter(F.col("ts") < split), "value", BIN_W, NBINS)
    got = batch_psi(e.filter(F.col("ts") >= split), "value", ref).first()
    want = registry.queries()["q_psi_drift"](spark, sf_dir).first()
    assert got["psi"] == want["psi"]
    assert not got["alert"]


def test_monitor_alerts_on_shifted_batch(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events")
    ref = fit_reference(e, "value", BIN_W, NBINS)

    # in-distribution: the same frame → PSI ~ 0
    ok = batch_psi(e, "value", ref).first()
    assert ok["psi"] < 0.01 and not ok["alert"]

    # shifted: all mass pushed into the top bin
    shifted = e.select((F.col("value") + F.lit(10_000.0)).alias("value"))
    bad = batch_psi(shifted, "value", ref).first()
    assert bad["psi"] > PSI_ALERT and bad["alert"]


@pytest.mark.parametrize("restart", [False, True])
def test_monitor_stream_end_to_end(spark, sf_dir, tmp_path, restart):
    e = load_table(spark, sf_dir, "events")
    ref = fit_reference(e, "value", BIN_W, NBINS)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    e.select("value").coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = monitor_stream(stream, "value", ref, out, ckpt)
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1  # one file → one micro-batch → one PSI row
    assert rows[0]["n_rows"] == e.count()
    assert rows[0]["psi"] < 0.01 and not rows[0]["alert"]

    if restart:
        # restart over the SAME source: checkpoint says batch 0 is done,
        # so no new rows appear (no duplicate PSI emissions)
        q2 = monitor_stream(
            spark.readStream.schema("value double").parquet(src),
            "value",
            ref,
            out,
            ckpt,
        )
        q2.processAllAvailable()
        q2.stop()
        assert spark.read.parquet(out).count() == 1

        # a NEW shifted file arrives → exactly one more row, alerting
        shifted = e.select((F.col("value") + F.lit(10_000.0)).alias("value"))
        shifted.coalesce(1).write.mode("append").parquet(src)
        # parquet file-source discovery is mtime-based; ensure distinct mtime
        time.sleep(0.05)
        q3 = monitor_stream(
            spark.readStream.schema("value double").parquet(src),
            "value",
            ref,
            out,
            ckpt,
        )
        q3.processAllAvailable()
        q3.stop()
        final = sorted(
            spark.read.parquet(out).collect(), key=lambda r: r["batch_id"]
        )
        assert len(final) == 2
        assert final[-1]["alert"]


def test_replayed_batch_overwrites_not_duplicates(spark, sf_dir, tmp_path):
    """Crash-replay idempotence at the SINK (VERDICT r4 item 4): a crash
    between the parquet write and the checkpoint commit replays the batch.
    Simulated with a FRESH checkpoint over the same source+output — batch 0
    runs again against an output that already holds its row.  The
    batch_id-partitioned dynamic overwrite must leave exactly one row per
    batch_id (the old append sink would have doubled it)."""
    e = load_table(spark, sf_dir, "events")
    ref = fit_reference(e, "value", BIN_W, NBINS)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    e.select("value").coalesce(1).write.parquet(src)

    for attempt, ckpt in enumerate(["ckpt_a", "ckpt_b"]):
        q = monitor_stream(
            spark.readStream.schema("value double").parquet(src),
            "value",
            ref,
            out,
            str(tmp_path / ckpt),
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1, f"attempt {attempt}: {rows}"
        assert int(rows[0]["batch_id"]) == 0
        assert rows[0]["n_rows"] == e.count()


def test_negative_values_count_in_edge_bin_both_sides(spark):
    """Out-of-range values must land in the edge bins on BOTH the
    reference fit and the live side (ADVICE r4): unclamped, a negative bin
    Python-wrapped into the LAST reference bin while the live spine join
    dropped the same rows — skewing PSI exactly when the feed breaks.
    Fitting and scoring the SAME frame containing negatives must read
    in-distribution (PSI ~ 0) with every row counted."""
    df = spark.range(200).select(
        (F.col("id").cast("double") * 5.0 - 100.0).alias("value")
    )  # values in [-100, 895): 20 negative rows
    ref = fit_reference(df, "value", BIN_W, NBINS)
    assert ref.total == 200  # negatives counted, not wrapped/dropped
    assert ref.counts[0] > 0
    got = batch_psi(df, "value", ref).first()
    assert got["n_rows"] == 200  # live side keeps the negative rows too
    assert got["psi"] < 0.01 and not got["alert"]


def test_null_values_excluded_both_sides(spark):
    """NULL metrics are EXCLUDED from the distribution on both the fit and
    the live side (fuzzer finding: least()'s NULL-skipping semantics
    silently bucketed NULLs into the TOP bin as extreme values, so a feed
    going part-NULL polluted the reference and inflated live drift).
    Fitting and scoring the same part-NULL frame must read
    in-distribution, with NULL rows absent from every count."""
    import pandas as pd

    vals = [float(v * 50) for v in range(10)] * 10
    df = spark.createDataFrame(
        pd.DataFrame({"value": vals + [None] * 37}), schema="value double"
    )
    ref = fit_reference(df, "value", BIN_W, NBINS)
    assert ref.total == 100  # NULLs not fitted
    assert ref.counts[-1] == 10  # top bin holds real data only, not NULLs
    got = batch_psi(df, "value", ref).first()
    assert got["n_rows"] == 100  # NULLs not scored
    assert got["psi"] < 0.01 and not got["alert"]
