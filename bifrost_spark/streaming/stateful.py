"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only state machine is the per-(topic,partition) writer/
uploader FSM (s3.clj:40-80); Spark's checkpoint subsumes it.  What the
reference CANNOT do — and a training-data pipeline needs — is arbitrary
keyed state over an unbounded stream.  Two operators:

* ``start_sessionizer`` — per-user session aggregation with a gap timeout,
  the streaming twin of the batch q_session_window (same semantics, so the
  batch oracle validates the logic and the streaming test validates the
  state plumbing: timeouts, watermark eviction, incremental emission).
* ``start_windowed_rollup`` — event-time tumbling window with a watermark
  (the event-time strengthening of the reference's processing-time rotation,
  kafka.clj:103-120: late data within the watermark is still aggregated
  into its window instead of the batch it happened to arrive in).

State per key is O(1) (running aggregates, no row buffering) — at 100 TB
the state store holds |active keys| tiny rows, and RocksDB state backend
(spark.sql.streaming.stateStore.providerClass) takes it out of heap.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

SESSION_GAP_SECS = 300

# (user_id) -> evolving session aggregate
_STATE_SCHEMA = "start_us long, last_us long, n_events int, sum_value double"
_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)


def _sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a user's new events into the open session; emit closed sessions.

    Sessions close when the processing-time timeout fires with no new events
    (GroupStateTimeout.ProcessingTimeTimeout) — the streaming analog of the
    batch gap rule.  State is 4 scalars regardless of event volume.
    """
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "sum_value": [sv],
            }
        )
        return

    start_us = last_us = None
    n, sv = 0, 0.0
    if state.exists:
        start_us, last_us, n, sv = state.get
    closed = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            us = int(pd.Timestamp(ts).value // 1_000)
            if last_us is not None and us - last_us > SESSION_GAP_SECS * 1_000_000:
                closed.append((start_us, last_us, n, sv))
                start_us, n, sv = us, 0, 0.0
            if start_us is None:
                start_us = us
            last_us = us
            n += 1
            sv += float(value)
    state.update((start_us, last_us, n, sv))
    state.setTimeoutDuration(SESSION_GAP_SECS * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                "n_events": [c for _, _, c, _ in closed],
                "sum_value": [v for _, _, _, v in closed],
            }
        )


def sessionized(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value) → closed-session rows (streaming DF)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def start_sessionizer(
    events: DataFrame, output_path: str, checkpoint_path: str, interval_secs: int = 1
) -> StreamingQuery:
    return (
        sessionized(events)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(processingTime=f"{interval_secs} seconds")
        .start()
    )


def streaming_dedup(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, drop replays.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark horizon — without it the key set grows forever, which is the
    difference between O(keys-in-window) and O(all-keys-ever) state at
    100 TB/day.  Exactly the semantics a training-data ingest needs against
    at-least-once upstreams (e.g. the reference's replay-on-crash delivery,
    s3.clj:40-80): replays within the horizon are dropped, and anything
    older is already archived and handled by the batch dedup
    (q_dedup_exact) downstream.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def session_rollup(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Native event-time session windows (the idiomatic twin of the custom
    ``sessionized`` operator): ``F.session_window`` merges rows into
    variable-length windows separated by ``gap``, watermark-bounded.

    Two sessionizers on purpose: this one when per-session aggregates
    suffice (built-in state handling, no Python), ``sessionized`` when the
    per-event fold needs arbitrary logic (custom features, early emission).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count("*").cast("int").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_rollup(events: DataFrame, window: str = "1 minute", watermark: str = "2 minutes") -> DataFrame:
    """Event-time tumbling rollup with late-data handling (A10, event-time).

    The watermark bounds state: windows older than (max event time −
    watermark) are finalized and evicted; later-than-watermark data is
    dropped (counted by the StreamingQueryListener's stateOperators
    numRowsDroppedByWatermark metric)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("topic"))
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


def start_windowed_rollup(
    events: DataFrame, output_path: str, checkpoint_path: str, interval_secs: int = 1
) -> StreamingQuery:
    return (
        windowed_rollup(events)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(processingTime=f"{interval_secs} seconds")
        .start()
    )


class _RunningTotals(StatefulProcessor):
    """transformWithStateInPandas processor: per-key running event count and
    value sum, emitted once per micro-batch the key appears in.

    The Spark 4 stateful API (successor of applyInPandasWithState): typed
    per-key ValueState lives in the state store (RocksDB-capable), and the
    runtime — not the operator — owns watermark/timer bookkeeping.  State
    per key is one (long, double) tuple: O(1) regardless of history, the
    same bound as the sessionizer."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, s DOUBLE")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, s = self._totals.get() or (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["event_value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events_total": [n], "sum_value_total": [s]}
        )

    def close(self) -> None:
        pass


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas``.

    Batch oracle: the final emission per key must equal the batch
    groupBy(user_id).agg(count, sum) over the same input (asserted in
    tests/test_streaming_stateful.py).

    Environment note: the transformWithState worker protocol requires
    ``google.protobuf`` on the Python workers; without it the query fails
    at state-schema validation (the test skips there).  The
    applyInPandasWithState operators above have no such dependency."""
    return (
        events.withWatermark("ts", "2 minutes")
        .groupBy(F.col("user_id"))
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotals(),
            outputStructType="user_id BIGINT, n_events_total BIGINT, sum_value_total DOUBLE",
            outputMode="Append",
            timeMode="EventTime",
        )
    )
