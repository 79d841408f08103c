"""Streaming group-sequential experiment monitor: per micro-batch of
enrollment outcomes, rebuild the K-look OBF/Pocock decision table from
the per-look counts already emitted — the always-on deployment of
``q_group_sequential`` (queries/experiment_ops.py) and the SIXTH
batch↔streaming pairing (centroid_drift, sketch_drift, sprt_monitor,
cusum_monitor, page_hinkley, and now the scheduled-looks design).

State device (output-carried, INTEGER increments — the sprt_monitor end
of the carry spectrum): each emit writes the full K-row decision table
carrying BOTH the cumulative readouts (n/conv per arm, z, boundaries,
reject flags — the q_group_sequential output contract) and this batch's
per-look integer increments (inc_n_a …), plus the anchor day (the
experiment start, fixed by the FIRST batch) — partitioned by batch_id.
The next batch recovers its per-(variant, look) cumulative cells by
summing the increments over partitions with ``batch_id < N`` only; that
restriction is what makes replay exactly-once (a re-run of batch N
never reads its own half-written output; the dynamic-overwrite sink
rewrites batch_id=N in place).  Integer sums recover EXACTLY, so the
continued table is identical to the single-shot one — the multi-batch
differential gate asserts set equality, not tolerance.

Ordering contract (the sprt_monitor guard): each micro-batch is
USER-COMPLETE (a user's whole history arrives in one batch — the
observation-window-closed delivery, since `converted` is undefined
before the window closes) and batches arrive in strictly increasing
entry-day order.  A late enrollment belongs to an already-emitted entry
day and is a backfill correction, not a monitor update — rejected.
The anchor day never moves after batch 0: with ordering, batch 0 holds
the global earliest enrollment, so the look schedule matches the batch
query's.

Determinism mirrors q_group_sequential: counts are exact integers; z
and the PRECOMPUTED boundary literals come from the shared
``gs_decision_frame`` — one spelling, decisions agree by construction.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bifrost_spark.queries.experiment_ops import (
    _GS_LOOKS,
    gs_assignments,
    gs_decision_frame,
    gs_look_cells,
)
from bifrost_spark.streaming._sink import output_exists, write_batch_partition

_INC_COLS = ("inc_n_a", "inc_c_a", "inc_n_b", "inc_c_b")


def _prior_state(
    spark, output_path: str, batch_id: int
) -> tuple[list[tuple[str, int, int, int]], object, object]:
    """(cells, anchor_day, max_entry_day) over output partitions with
    batch_id strictly below the current one: cells are the summed
    per-(variant, look) integer increments (≤ 2K rows, driver-held).
    Only the missing-path first-batch case resets to empty; any other
    read error propagates so the micro-batch retries (the sprt_monitor
    ADVICE-r8 contract)."""
    if not output_exists(spark, output_path):
        return [], None, None
    prior = spark.read.parquet(output_path).filter(F.col("batch_id") < batch_id)
    rows = (
        prior.groupBy("look")
        .agg(
            *[F.sum(c).alias(c) for c in _INC_COLS],
            F.min("anchor_day").alias("anchor"),
            F.max("max_entry_day").alias("entry_max"),
        )
        .collect()
    )
    if not rows:
        return [], None, None
    cells: list[tuple[str, int, int, int]] = []
    for r in rows:
        cells.append(("A", int(r["look"]), int(r["inc_n_a"]), int(r["inc_c_a"])))
        cells.append(("B", int(r["look"]), int(r["inc_n_b"]), int(r["inc_c_b"])))
    anchor = min(r["anchor"] for r in rows)
    entry_max = max(r["entry_max"] for r in rows)
    return cells, anchor, entry_max


def batch_gst_update(
    batch: DataFrame,
    prior_cells: list[tuple[str, int, int, int]],
    anchor: _dt.date | None,
) -> tuple[DataFrame | None, object, object]:
    """One micro-batch of raw events → (the full K-look decision table
    with increment/anchor recovery columns, batch min entry day, batch
    max entry day).  Returns (None, None, None) for a batch with no
    attributable users."""
    spark = batch.sparkSession
    assign = gs_assignments(batch)
    bounds = assign.agg(
        F.min(F.col("first_day").cast("date")).alias("dmin"),
        F.max(F.col("first_day").cast("date")).alias("dmax"),
    ).collect()[0]
    if bounds["dmin"] is None:
        return None, None, None
    if anchor is None:
        anchor = bounds["dmin"]
    d0 = spark.createDataFrame([(anchor,)], "d0 date")
    inc = gs_look_cells(assign, d0).localCheckpoint(eager=True)
    if prior_cells:
        prior = spark.createDataFrame(
            prior_cells, "variant string, look bigint, n bigint, c bigint"
        )
        cells = (
            inc.unionByName(prior)
            .groupBy("variant", "look")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("c").cast("bigint").alias("c"),
            )
        )
    else:
        cells = inc
    table = gs_decision_frame(spark, cells)
    inc_wide = inc.groupBy("look").agg(
        F.coalesce(
            F.sum(F.when(F.col("variant") == "A", F.col("n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("inc_n_a"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == "A", F.col("c"))), F.lit(0)
        )
        .cast("bigint")
        .alias("inc_c_a"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == "B", F.col("n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("inc_n_b"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == "B", F.col("c"))), F.lit(0)
        )
        .cast("bigint")
        .alias("inc_c_b"),
    )
    out = (
        table.join(inc_wide, "look", "left")
        .select(
            "*",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(f"_{c}")
                for c in _INC_COLS
            ],
        )
        .drop(*_INC_COLS)
    )
    for c in _INC_COLS:
        out = out.withColumnRenamed(f"_{c}", c)
    out = out.withColumn("anchor_day", F.lit(anchor).cast("date")).withColumn(
        "max_entry_day", F.lit(bounds["dmax"]).cast("date")
    )
    return out, bounds["dmin"], bounds["dmax"]


def start_gst_monitor(
    stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Start the monitor on a stream of raw events: each micro-batch
    derives its per-look enrollment increments, rebuilds the K-look
    decision table from the output-carried cumulative cells, and emits
    it to the batch_id-partitioned replay-idempotent sink."""

    def _emit(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        cells, anchor, entry_max = _prior_state(spark, output_path, batch_id)
        update, dmin, _ = batch_gst_update(batch, cells, anchor)
        if update is None:
            return
        if entry_max is not None and dmin is not None and dmin <= entry_max:
            raise ValueError(
                f"gst_monitor: batch {batch_id} contains entry day "
                f"{dmin} <= last emitted entry day {entry_max}; late "
                "enrollments are backfill corrections, not monitor "
                "updates (ordering contract)"
            )
        write_batch_partition(update, batch_id, output_path)

    return (
        stream.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


__all__ = [
    "batch_gst_update",
    "start_gst_monitor",
    "_GS_LOOKS",
]
