"""Streaming keyed-upsert sink + stream-static enrichment: current-state
semantics (last value per key), replay idempotence, crash-safe compaction,
and per-batch dim visibility — on the file-source Kafka stand-in.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bifrost_spark.streaming.join import enrich_stream
from bifrost_spark.streaming.upsert import (
    compact_state,
    read_state,
    start_keyed_upsert,
    upsert_batch,
)


@pytest.fixture()
def staged_updates(spark, tmp_path):
    """3 parquet files = 3 micro-batches of keyed updates (cdc-style)."""
    batches = [
        [(1, "a", 10, 100.0), (2, "b", 10, 200.0), (3, "c", 10, 300.0)],
        [(1, "a2", 20, 110.0), (2, "b2", 20, 210.0)],
        [(1, "a3", 30, 120.0), (4, "d", 30, 400.0)],
    ]
    path = tmp_path / "in"
    for rows in batches:
        df = spark.createDataFrame(
            rows, "key long, payload string, version long, value double"
        )
        df.coalesce(1).write.mode("append").parquet(str(path))
    return str(path)


def _run(spark, in_path, tmp_path):
    schema = "key long, payload string, version long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_path)
    )
    q = start_keyed_upsert(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        key_cols=["key"],
        ts_col="version",
        tiebreak_cols=["payload"],
    )
    q.processAllAvailable()
    q.stop()


def test_state_is_latest_per_key(spark, staged_updates, tmp_path):
    _run(spark, staged_updates, tmp_path)
    state = read_state(
        spark, str(tmp_path / "state"), ["key"], "version", ["payload"]
    )
    got = {(r.key, r.payload, r.version) for r in state.collect()}
    assert got == {(1, "a3", 30), (2, "b2", 20), (3, "c", 10), (4, "d", 30)}


def test_replayed_batch_is_idempotent(spark, staged_updates, tmp_path):
    _run(spark, staged_updates, tmp_path)
    before = {
        (r.key, r.payload, r.version)
        for r in read_state(
            spark, str(tmp_path / "state"), ["key"], "version", ["payload"]
        ).collect()
    }
    # simulate foreachBatch replay after a crash: re-apply an old batch
    replay = spark.createDataFrame(
        [(1, "a2", 20, 110.0), (2, "b2", 20, 210.0)],
        "key long, payload string, version long, value double",
    )
    upsert_batch(replay, 1, str(tmp_path / "state"), ["key"], "version",
                 ["payload"])
    after = {
        (r.key, r.payload, r.version)
        for r in read_state(
            spark, str(tmp_path / "state"), ["key"], "version", ["payload"]
        ).collect()
    }
    assert after == before


def test_compaction_preserves_state(spark, staged_updates, tmp_path):
    import glob

    _run(spark, staged_updates, tmp_path)
    p = str(tmp_path / "state")
    before = {
        (r.key, r.payload, r.version)
        for r in read_state(spark, p, ["key"], "version", ["payload"]).collect()
    }
    n = compact_state(spark, p, ["key"], "version", ["payload"])
    assert n == len(before)
    deltas = glob.glob(f"{p}/delta/batch_id=*")
    assert [d.rsplit("=", 1)[1] for d in deltas] == ["-1"]
    after = {
        (r.key, r.payload, r.version)
        for r in read_state(spark, p, ["key"], "version", ["payload"]).collect()
    }
    assert after == before


def test_repeated_compaction_steps_base_generation(spark, staged_updates, tmp_path):
    """compact -> new batch -> compact: the second base must get a FRESH
    batch_id (-2), never rename over the live -1 base, and keep the view
    exact."""
    import glob

    _run(spark, staged_updates, tmp_path)
    p = str(tmp_path / "state")
    compact_state(spark, p, ["key"], "version", ["payload"])
    update = spark.createDataFrame(
        [(2, "b9", 40, 220.0), (5, "e", 40, 500.0)],
        "key long, payload string, version long, value double",
    )
    upsert_batch(update, 3, p, ["key"], "version", ["payload"])
    n = compact_state(spark, p, ["key"], "version", ["payload"])
    assert n == 5
    deltas = sorted(d.rsplit("=", 1)[1] for d in glob.glob(f"{p}/delta/batch_id=*"))
    assert deltas == ["-2"]
    got = {
        (r.key, r.payload, r.version)
        for r in read_state(spark, p, ["key"], "version", ["payload"]).collect()
    }
    assert got == {(1, "a3", 30), (2, "b9", 40), (3, "c", 10), (4, "d", 30),
                   (5, "e", 40)}


def test_compaction_crash_mid_delete_keeps_view(spark, staged_updates, tmp_path):
    """Crash after the base rename but before the superseded deltas are
    deleted: readers must still resolve the identical view, and the next
    compaction converges.  The crash state is reproduced directly: a
    compacted layout plus a surviving superseded delta."""
    import glob

    _run(spark, staged_updates, tmp_path)
    p = str(tmp_path / "state")
    before = {
        (r.key, r.payload, r.version)
        for r in read_state(spark, p, ["key"], "version", ["payload"]).collect()
    }

    compact_state(spark, p, ["key"], "version", ["payload"])
    stale = spark.createDataFrame(
        [(1, "a2", 20, 110.0), (2, "b2", 20, 210.0)],
        "key long, payload string, version long, value double",
    )
    stale.write.mode("overwrite").parquet(f"{p}/delta/batch_id=1")

    assert {
        (r.key, r.payload, r.version)
        for r in read_state(spark, p, ["key"], "version", ["payload"]).collect()
    } == before
    compact_state(spark, p, ["key"], "version", ["payload"])
    deltas = sorted(d.rsplit("=", 1)[1] for d in glob.glob(f"{p}/delta/batch_id=*"))
    assert deltas == ["-2"]
    assert {
        (r.key, r.payload, r.version)
        for r in read_state(spark, p, ["key"], "version", ["payload"]).collect()
    } == before


def test_tie_resolution_is_batch_split_invariant(spark, tmp_path):
    """Two rows with the SAME (key, ts) must resolve by tiebreak_cols
    regardless of whether they arrived in one batch or two — and the
    winner must survive compaction + replay unchanged."""
    p = str(tmp_path / "state")
    schema = "key long, payload string, version long, value double"
    r_lo = [(1, "aaa", 10, 1.0)]
    r_hi = [(1, "zzz", 10, 2.0)]

    def winner():
        df = read_state(spark, p, ["key"], "version", ["payload"])
        return [(r.key, r.payload) for r in df.collect()]

    # split across two batches, lower-tiebreak row in the LATER batch
    upsert_batch(spark.createDataFrame(r_hi, schema), 0, p, ["key"],
                 "version", ["payload"])
    upsert_batch(spark.createDataFrame(r_lo, schema), 1, p, ["key"],
                 "version", ["payload"])
    assert winner() == [(1, "zzz")]
    # compaction re-bases the winner to batch_id=-1; a replayed batch 1
    # (uncommitted before a crash) must not flip the resolved tie
    compact_state(spark, p, ["key"], "version", ["payload"])
    upsert_batch(spark.createDataFrame(r_lo, schema), 1, p, ["key"],
                 "version", ["payload"])
    assert winner() == [(1, "zzz")]


def test_enrich_stream_per_batch_dim_visibility(spark, staged_updates, tmp_path):
    """Stream-static join: output carries dim attributes; updating the dim
    between runs is visible without restarting from scratch (static side
    re-read per batch)."""
    dim_path = tmp_path / "dim"
    spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze"), (4, "gold")],
        "key long, segment string",
    ).write.mode("overwrite").parquet(str(dim_path))

    schema = "key long, payload string, version long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_updates)
    )
    dim = spark.read.parquet(str(dim_path))
    out = enrich_stream(stream, dim, "key")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "enriched"))
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    res = spark.read.parquet(str(tmp_path / "enriched"))
    assert res.count() == 7  # every staged row enriched
    segs = {(r.key, r.segment) for r in res.select("key", "segment").collect()}
    assert segs == {(1, "gold"), (2, "silver"), (3, "bronze"), (4, "gold")}
    assert res.filter(F.col("segment").isNull()).count() == 0
