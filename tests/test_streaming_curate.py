"""Gates for the streaming ingest-curation flow (streaming/curate.py):
exact survivor set on a crafted corpus (dups + contaminated + low-quality
+ keepers), per-stage observed funnel counts, batch-predicate parity with
q_gopher_rules, and restart idempotence (no duplicate output rows)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bifrost_spark.streaming.curate import (
    curate_stream,
    gopher_keep_predicate,
    start_curated_ingest,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and runs to the hills in "
    "the morning light with a steady pace and a clear goal in mind today"
)
GOOD2 = (
    "a good document is made of many plain words and the right mix of "
    "stopwords to show that it is real text written in a natural way"
)
BAD_SHORT = "too short to keep"
CONTAMINATED = (
    "this text is secretly a benchmark item and must never reach the "
    "training corpus because the eval would be contaminated by it today"
)


def _corpus():
    rows = []
    ts = pd.Timestamp("2024-01-01 00:00:00")
    # keeper, its exact duplicate (later ts), a second keeper, a
    # low-quality doc, and a contaminated doc
    rows.append((0, GOOD, ts))
    rows.append((1, GOOD, ts + pd.Timedelta(seconds=30)))  # dup of 0
    rows.append((2, GOOD2, ts + pd.Timedelta(seconds=60)))
    rows.append((3, BAD_SHORT, ts + pd.Timedelta(seconds=90)))
    rows.append((4, CONTAMINATED, ts + pd.Timedelta(seconds=120)))
    return pd.DataFrame(rows, columns=["doc_id", "text", "ts"])


@pytest.fixture()
def staged(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(_corpus()).coalesce(1).write.parquet(src)
    # static contamination set = md5 of the contaminated text
    contaminated = spark.createDataFrame(
        pd.DataFrame({"text": [CONTAMINATED]})
    ).select(F.md5("text").alias("content_hash"))
    return src, contaminated


def test_curated_ingest_end_to_end(spark, tmp_path, staged):
    src, contaminated = staged
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_curated_ingest(stream, contaminated, out, ckpt)
    q.processAllAvailable()
    q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # dup (1), short (3), contaminated (4) all dropped
    assert got == [0, 2]

    # restart over the same source: no duplicates appear
    q2 = start_curated_ingest(
        spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src),
        contaminated,
        out,
        ckpt,
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == 2


def test_observed_funnel_counts(spark, tmp_path, staged):
    import json
    import time

    src, contaminated = staged
    events = []
    from pyspark.sql.streaming import StreamingQueryListener

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            pass

        def onQueryProgress(self, e):  # noqa: N802
            events.append(json.loads(e.progress.json))

        def onQueryTerminated(self, e):  # noqa: N802
            pass

        def onQueryIdle(self, e):  # noqa: N802
            pass

    listener = L()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(src)
        q = start_curated_ingest(
            stream, contaminated, str(tmp_path / "o2"), str(tmp_path / "c2")
        )
        q.processAllAvailable()
        q.stop()
        funnel = {}
        for _ in range(100):
            funnel = {}
            for p in events:
                for name, m in (p.get("observedMetrics") or {}).items():
                    funnel[name] = funnel.get(name, 0) + (m or {}).get("n", 0)
            if funnel.get("curate_in"):
                break
            time.sleep(0.1)
        assert funnel["curate_in"] == 5
        assert funnel["curate_dedup"] == 4  # one exact dup dropped
        assert funnel["curate_decon"] == 3  # one contaminated dropped
        assert funnel["curate_kept"] == 2  # one low-quality dropped
    finally:
        spark.streams.removeListener(listener)


def test_keep_predicate_matches_batch_gopher_rules(spark, sf_dir):
    """The streaming gate must agree with the oracle-checked batch query
    on the real fixture: keep flags identical for every document."""
    from bifrost_spark import registry
    from bifrost_spark.tables import load_table

    batch = {
        r["doc_id"]: r["keep"]
        for r in registry.queries()["q_gopher_rules"](spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["k"]
        for r in d.select(
            "doc_id", gopher_keep_predicate().cast("bigint").alias("k")
        ).collect()
    }
    assert got == batch
