"""Tests for the custom stateful streaming operators (streaming/stateful.py):

* sessionizer — applyInPandasWithState keyed session aggregation; validated
  against the BATCH gap-sessionization of the same input (the streaming and
  batch session rules are identical, so closed streaming sessions must be a
  subset, and after the timeout fires, per-key counts must reconcile);
* windowed rollup — event-time tumbling window + watermark; totals and
  per-window offset bounds must match the batch groupBy(window) answer.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bifrost_spark.streaming.archive import MESSAGE_SCHEMA
from bifrost_spark.streaming.stateful import (
    SESSION_GAP_SECS,
    sessionized,
    start_windowed_rollup,
    windowed_rollup,
)
from bifrost_spark.tables import load_table


@pytest.fixture(scope="module")
def staged_events(spark, sf_dir, tmp_path_factory):
    """events in message shape, staged as 3 files in event-time order."""
    path = str(tmp_path_factory.mktemp("stateful_in"))
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    msgs = ev.select(
        F.col("event_type").alias("topic"),
        F.pmod("user_id", F.lit(4)).cast("int").alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        F.encode("props", "UTF-8").alias("value"),
        "ts",
        F.col("user_id"),
        F.col("value").alias("event_value"),
        F.ntile(3).over(Window.orderBy("ts")).alias("chunk"),
    )
    msgs.cache().count()
    for b in range(1, 4):
        msgs.filter(F.col("chunk") == b).drop("chunk").coalesce(1).write.mode(
            "append"
        ).parquet(path)
    msgs.unpersist()
    return path


def test_windowed_rollup_matches_batch(spark, staged_events, tmp_path):
    from pyspark.sql.types import LongType, DoubleType, StructField, StructType

    schema = StructType(
        MESSAGE_SCHEMA.fields
        + [StructField("user_id", LongType()), StructField("event_value", DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_events)
    )
    q = start_windowed_rollup(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), interval_secs=1
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(str(tmp_path / "out"))
    # batch truth over the same staged input
    src = spark.read.parquet(staged_events)
    expect = (
        src.groupBy(F.window("ts", "1 minute").alias("win"), "topic")
        .agg(
            F.count("*").alias("n"),
            F.min("offset").alias("first_offset"),
            F.max("offset").alias("last_offset"),
        )
        .select(F.col("win.start").alias("window_start"), "topic", "n", "first_offset", "last_offset")
    )
    # The stream emits only windows finalized by the watermark; rows it DID
    # emit must agree exactly with batch truth, and it must have emitted the
    # overwhelming majority of windows.
    emitted = {tuple(r) for r in got.collect()}
    truth = {tuple(r) for r in expect.collect()}
    assert emitted <= truth, "streaming rollup emitted a row batch truth doesn't have"
    assert len(emitted) >= 0.8 * len(truth), (len(emitted), len(truth))


def test_native_session_rollup_subset_of_batch(spark, staged_events, tmp_path):
    """F.session_window streaming sessions: emitted (watermark-finalized)
    sessions must exactly match rows of the batch session_window answer over
    the same input."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from bifrost_spark.streaming.stateful import session_rollup

    schema = StructType(
        MESSAGE_SCHEMA.fields
        + [StructField("user_id", LongType()), StructField("event_value", DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_events)
        .select("user_id", "ts")
    )
    q = (
        session_rollup(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(str(tmp_path / "out"))
    src = spark.read.parquet(staged_events).select("user_id", "ts")
    batch = (
        src.groupBy(F.session_window("ts", "5 minutes").alias("win"), "user_id")
        .agg(F.count("*").cast("int").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )
    emitted = {tuple(r) for r in got.collect()}
    truth = {tuple(r) for r in batch.collect()}
    assert emitted, "no sessions emitted"
    assert emitted <= truth
    assert len(emitted) >= 0.8 * len(truth), (len(emitted), len(truth))


def test_streaming_dedup_drops_replays(spark, staged_events, tmp_path):
    """Feed the staged stream TWICE (copy the files) — every row is a replay
    of itself; the watermarked dedup must emit each (topic, partition,
    offset) exactly once."""
    import glob
    import shutil

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from bifrost_spark.streaming.stateful import streaming_dedup

    dup_path = str(tmp_path / "dup_in")
    shutil.copytree(staged_events, dup_path)
    for i, f in enumerate(glob.glob(f"{staged_events}/*.parquet")):
        shutil.copy(f, f"{dup_path}/replay-{i}.parquet")

    schema = StructType(
        MESSAGE_SCHEMA.fields
        + [StructField("user_id", LongType()), StructField("event_value", DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(dup_path)
        .select("topic", "partition", "offset", "ts")
    )
    q = (
        streaming_dedup(stream, ("topic", "partition", "offset"))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    out = spark.read.parquet(str(tmp_path / "out"))
    n_unique = spark.read.parquet(staged_events).count()
    assert out.count() == n_unique
    assert out.select("topic", "partition", "offset").distinct().count() == n_unique


def test_sessionizer_closes_sessions(spark, staged_events, tmp_path):
    from pyspark.sql.types import LongType, DoubleType, StructField, StructType

    schema = StructType(
        MESSAGE_SCHEMA.fields
        + [StructField("user_id", LongType()), StructField("event_value", DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_events)
        .select("user_id", "ts", F.col("event_value").alias("value"))
    )
    q = (
        sessionized(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    # NB: processAllAvailable() never quiesces here — processing-time
    # timeouts keep scheduling batches forever.  Poll instead: data-gap
    # closures (gap > 5 min WITHIN the data) emit as soon as their batch
    # runs, so wait until some sessions have been written, then stop.
    deadline = time.time() + 120
    got = None
    while time.time() < deadline:
        if q.exception():
            raise AssertionError(str(q.exception()))
        try:
            got = spark.read.parquet(str(tmp_path / "out"))
            if got.count() > 0:
                break
        except Exception:
            pass
        time.sleep(2)
    q.stop()
    assert got is not None and got.count() > 0, "no sessions closed within 120s"

    # batch truth: gap-rule sessions over the same input
    src = spark.read.parquet(staged_events).select("user_id", "ts", F.col("event_value").alias("value"))
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        src.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("prev_ts")
                    > SESSION_GAP_SECS * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
        )
    )
    truth = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sess.collect()
    }
    emitted = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.select("user_id", "session_start", "session_end", "n_events").collect()
    }
    assert emitted, "expected at least one closed session"
    assert emitted <= truth, "streaming closed a session batch truth doesn't have"


def test_windowed_rollup_on_rocksdb_state_store(spark, staged_events, tmp_path):
    """Same rollup, RocksDB state store (the 100 TB state backend: state
    lives off-heap/on-disk per executor instead of in the JVM heap, so key
    cardinality is bounded by disk, not memory).  Output invariants must be
    identical to the default HDFS-backed provider's."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = StructType(
            MESSAGE_SCHEMA.fields
            + [
                StructField("user_id", LongType()),
                StructField("event_value", DoubleType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged_events)
        )
        q = start_windowed_rollup(
            stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), interval_secs=1
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)

    got = spark.read.parquet(str(tmp_path / "out"))
    src = spark.read.parquet(staged_events)
    expect = (
        src.groupBy(F.window("ts", "1 minute").alias("win"), "topic")
        .agg(
            F.count("*").alias("n"),
            F.min("offset").alias("first_offset"),
            F.max("offset").alias("last_offset"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "topic",
            "n",
            "first_offset",
            "last_offset",
        )
    )
    emitted = {tuple(r) for r in got.collect()}
    truth = {tuple(r) for r in expect.collect()}
    assert emitted, "no windows emitted under RocksDB provider"
    assert emitted <= truth, "RocksDB rollup emitted a row batch truth doesn't have"
    assert len(emitted) >= 0.8 * len(truth), (len(emitted), len(truth))


def test_stream_stream_attribution_join(spark, staged_events, tmp_path):
    """Stream-stream windowed inner join (streaming/join.py): emitted
    (click, purchase) pairs must be a subset of the batch range-join truth
    over the same input, and cover nearly all of it after a full drain
    (inner joins emit eagerly; the watermark only bounds state)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from bifrost_spark.streaming.join import (
        ATTRIBUTION_WINDOW_SECS,
        start_attribution_join,
    )

    schema = StructType(
        MESSAGE_SCHEMA.fields
        + [StructField("user_id", LongType()), StructField("event_value", DoubleType())]
    )

    def side(topic):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged_events)
            .filter(F.col("topic") == topic)
            .select("user_id", F.col("offset").alias("event_id"), "ts")
        )

    q = start_attribution_join(
        side("click"), side("purchase"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(str(tmp_path / "out"))
    src = spark.read.parquet(staged_events)
    c = src.filter(F.col("topic") == "click").select(
        F.col("user_id").alias("c_user"), F.col("offset").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = src.filter(F.col("topic") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("offset").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    truth_df = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_SECS} SECONDS")
        ),
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    truth = {(r.user_id, r.click_id, r.purchase_id) for r in truth_df.collect()}
    emitted = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in got.select("user_id", "click_id", "purchase_id").collect()
    }
    assert emitted, "stream-stream join emitted nothing"
    assert emitted <= truth, "streaming join emitted a pair batch truth doesn't have"
    assert len(emitted) >= 0.8 * len(truth), (len(emitted), len(truth))


def test_stream_static_enrichment_join(spark, staged_events, tmp_path, sf_dir):
    """Stream-static join: every message enriched with the customer
    dimension.  Stateless (the static side is re-read per micro-batch, no
    state store), so the drained output must EQUAL the batch join exactly
    — stronger than the watermark-subset invariants above."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        MESSAGE_SCHEMA.fields
        + [StructField("user_id", LongType()), StructField("event_value", DoubleType())]
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_events)
        .select("user_id", "offset", "topic")
        .join(dim, "user_id", "left")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, r.offset, r.topic, r.c_mktsegment)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    truth = {
        (r.user_id, r.offset, r.topic, r.c_mktsegment)
        for r in spark.read.parquet(staged_events)
        .select("user_id", "offset", "topic")
        .join(dim, "user_id", "left")
        .collect()
    }
    assert got == truth


def test_streaming_dedup_key_churn_on_rocksdb(spark, staged_events, tmp_path):
    """Key-churn soak: the dedup key (topic, partition, offset) is UNIQUE
    per row, so state inserts one entry per input row — the worst-case
    cardinality profile — on the RocksDB provider, with every row also
    replayed once.  Output must still be exactly-once per key, proving the
    off-heap state path handles insert-heavy churn identically."""
    import glob
    import shutil

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from bifrost_spark.streaming.stateful import streaming_dedup

    dup_path = str(tmp_path / "dup_in")
    shutil.copytree(staged_events, dup_path)
    for i, f in enumerate(glob.glob(f"{staged_events}/*.parquet")):
        shutil.copy(f, f"{dup_path}/replay-{i}.parquet")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = StructType(
            MESSAGE_SCHEMA.fields
            + [
                StructField("user_id", LongType()),
                StructField("event_value", DoubleType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(dup_path)
            .select("topic", "partition", "offset", "ts")
        )
        q = (
            streaming_dedup(stream, ("topic", "partition", "offset"))
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(processingTime="1 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)

    out = spark.read.parquet(str(tmp_path / "out"))
    n_unique = spark.read.parquet(staged_events).count()
    assert out.count() == n_unique
    assert out.select("topic", "partition", "offset").distinct().count() == n_unique


def test_transform_with_state_running_totals(spark, staged_events, tmp_path):
    """Spark 4 transformWithStateInPandas: the LAST emitted running total
    per user must equal the batch groupBy totals over the same input.

    The transformWithState protocol needs google.protobuf on the Python
    workers; environments without it (like this container) skip — the
    applyInPandasWithState operators above cover the same semantics."""
    pytest.importorskip("google.protobuf.descriptor")
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from bifrost_spark.streaming.stateful import running_totals

    schema = StructType(
        MESSAGE_SCHEMA.fields
        + [StructField("user_id", LongType()), StructField("event_value", DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_events)
        .select("user_id", "ts", "event_value")
    )
    q = (
        running_totals(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(str(tmp_path / "out"))
    # last emission per user = the row with the max running count
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events_total"))
    final = (
        got.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events_total", "sum_value_total")
    )
    src = spark.read.parquet(staged_events)
    expect = src.groupBy("user_id").agg(
        F.count("*").alias("n_events_total"),
        F.sum("event_value").alias("sum_value_total"),
    )
    f = {(r.user_id, r.n_events_total) for r in final.collect()}
    e = {(r.user_id, r.n_events_total) for r in expect.collect()}
    assert f == e
    # sums: python float accumulation order differs from Spark's — compare
    # within float tolerance
    fs = {r.user_id: r.sum_value_total for r in final.collect()}
    es = {r.user_id: r.sum_value_total for r in expect.collect()}
    for uid, v in es.items():
        assert abs(fs[uid] - v) <= 1e-6 * max(1.0, abs(v)), uid
