"""Stream-stream join: event-time windowed inner/left joins between two
live streams.

The reference (uswitch/bifrost) archives single streams; correlating two
topics (e.g. clicks ↔ purchases for attribution labels) is downstream work
it cannot express.  Structured Streaming CAN: both sides are watermarked,
the join condition carries an event-time bound, and Spark buffers only the
rows inside the watermark horizon in the state store — bounded state, no
unbounded buffering.

Scale shape: the join shuffles both streams by the equi-key (user_id), so
each state-store partition holds only its key range; state size is
O(rate × window) per side, evicted by the watermark.  With the RocksDB
provider the buffer lives off-heap.  This is the streaming twin of the
batch q_join_range (same time-band semantics), so the batch range join is
the oracle: emitted pairs must be a subset of the batch answer over the
same input, converging to equality once watermarks pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

ATTRIBUTION_WINDOW_SECS = 30 * 60  # purchase within 30 min of the click


def attribution_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Inner join: each purchase matched to every click by the same user in
    the preceding ATTRIBUTION_WINDOW_SECS.

    Both sides watermarked 2 minutes: a click row is held in state only
    until the purchase-side watermark passes click_ts + window, then
    evicted — the condition's time bound is what lets Spark prove
    eviction is safe.
    """
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 minutes")
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 minutes")
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_SECS} SECONDS")
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id", "click_ts", "purchase_ts"
    )


def start_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    output_path: str,
    checkpoint_path: str,
    interval_secs: int = 1,
) -> StreamingQuery:
    return (
        attribution_join(clicks, purchases)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{interval_secs} seconds")
        .outputMode("append")
        .start()
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str,
                  broadcast_dim: bool = True) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream joins
    the (slowly-changing) static dimension — the classic lookup-table
    pattern (user → segment, topic → owner) the archival path needs the
    moment payloads get attributed.

    Semantics Spark guarantees: the STATIC side is re-evaluated per
    micro-batch, so a dim-table update between triggers is visible to the
    next batch without restarting the query.  No watermark and no state
    store — nothing is buffered, because the static side is always fully
    available.

    Scale: dims that fit the broadcast threshold ship once per batch to
    every executor (zero shuffle of the stream).  For SF-scaled dims set
    ``broadcast_dim=False`` and pre-bucket the dim on the join key so the
    per-batch shuffle hits co-located buckets (io.py::write_bucketed_table).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, "left")
