"""Streaming ingest curation: the LLM-data ingest pipeline as ONE
Structured Streaming flow — exact dedup within the watermark horizon,
decontamination against a static benchmark-hash set, and the Gopher-style
quality gate — with per-stage observe() counters so the funnel
(rows in → deduped → clean → kept) is metered in-flight, per micro-batch,
with no second pass.

This composes the batch operators' semantics at ingest time, which is
where a production crawl pipeline actually wants them (drop junk BEFORE
paying to store it):

* dedup — ``dropDuplicatesWithinWatermark`` on the md5 content hash (the
  q_dedup_exact key); state is bounded by the watermark horizon, so a
  duplicate arriving within the horizon is dropped exactly, and the state
  store never grows unboundedly (the 100 TB/day requirement).
* decontamination — LEFT ANTI against the static benchmark-hash frame
  (the q_decontaminate shape); the static side is a broadcast of hashes,
  never text.
* quality — the q_gopher_rules keep-predicate (same constants, imported),
  evaluated scan-local.

Each stage's observe() emits its surviving row count per micro-batch;
``MetricsListener`` forwards them to StatsD as
``bifrost.observed.curate_<stage>.*`` gauges, so the ops dashboard shows
the drop funnel live — the reference's A20 meters, applied to curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bifrost_spark.queries.llm_clean import (
    _MAX_WORDS,
    _MIN_MWL,
    _MAX_MWL,
    _MIN_STOPWORD_KINDS,
    _MIN_WORDS,
    _STOPWORDS,
)


def gopher_keep_predicate():
    """The q_gopher_rules keep condition as a reusable Column (same
    constants — the batch query is the oracle for this predicate)."""
    words = F.filter(F.split(F.col("text"), " ", -1), lambda t: t != "")
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    # NULL (not ANSI crash) on zero-word docs — one junk crawl doc must
    # not kill the streaming job; NULL comparisons make keep false.
    mean_wl = F.when(n_words > 0, total_chars.cast("double") / n_words)
    stop_kinds = F.size(
        F.array_distinct(F.filter(words, lambda t: t.isin(*_STOPWORDS)))
    )
    return (
        n_words.between(_MIN_WORDS, _MAX_WORDS)
        & (mean_wl >= _MIN_MWL)
        & (mean_wl <= _MAX_MWL)
        & (stop_kinds >= _MIN_STOPWORD_KINDS)
    )


def curate_stream(
    docs: DataFrame,
    contaminated_hashes: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Wire the curation stages onto a streaming documents frame
    (doc_id, text, ts).  ``contaminated_hashes`` is a STATIC frame with a
    single ``content_hash`` column (md5 hex of benchmark texts)."""
    hashed = docs.withColumn("content_hash", F.md5("text")).observe(
        "curate_in", F.count(F.lit(1)).alias("n")
    )
    deduped = (
        hashed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .observe("curate_dedup", F.count(F.lit(1)).alias("n"))
    )
    decontaminated = deduped.join(
        F.broadcast(contaminated_hashes), "content_hash", "left_anti"
    ).observe("curate_decon", F.count(F.lit(1)).alias("n"))
    return decontaminated.filter(gopher_keep_predicate()).observe(
        "curate_kept", F.count(F.lit(1)).alias("n")
    )


def start_curated_ingest(
    docs: DataFrame,
    contaminated_hashes: DataFrame,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Start the curation flow into a parquet sink (append, exactly-once
    via the checkpoint + sink manifest, same contract as the archive)."""
    curated = curate_stream(docs, contaminated_hashes, watermark)
    return (
        curated.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
