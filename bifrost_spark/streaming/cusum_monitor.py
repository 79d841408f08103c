"""Streaming CUSUM change-point monitor: per micro-batch of raw events,
continue Page's control-chart recursion from the (S+, S−) state already
emitted — the always-on deployment of ``q_cusum_drift``
(queries/monitor_ops.py) and the FOURTH batch↔streaming pairing
(centroid_drift, sketch_drift, sprt_monitor, and now the CUSUM), built
on the output-carried-state device the SPRT twin proved (VERDICT r8
item 3c).

State device: the CUSUM is inherently CUMULATIVE — day t's (S+, S−)
need day t−1's.  Instead of a state store, the state lives in the
monitor's OWN OUTPUT: each emit writes per-day rows carrying BOTH the
9-dp rounded readouts (day_mean, s_pos, s_neg, alarms — the
q_cusum_drift output contract) and the RAW doubles sp_exact / sn_exact,
partitioned by batch_id; the next batch recovers its offsets from the
max-day row over partitions with ``batch_id < N`` only.  Raw doubles
round-trip parquet losslessly, so the continued walk is BIT-IDENTICAL
to a single-shot walk — which is what the multi-batch differential gate
asserts with set equality, not tolerance.  The ``batch_id < N``
restriction is what makes replay exactly-once (a re-run of batch N
never reads its own half-written output; the dynamic-overwrite sink
rewrites batch_id=N in place).

Baseline: (mu0, s0) are fitted ONCE from a standing batch frame (the
first week) by ``fit_cusum_baseline`` — the SAME cusum_daily_frame /
cusum_baseline_frames spelling the batch query uses — and collected to
two Python floats the caller passes in: two driver-held scalars, no
executor-resident state to lose (the sketch_drift ADVICE-r8 lesson,
taken one step further).

Ordering contract (the sprt_monitor guard): each micro-batch carries
whole days and batches arrive in nondecreasing day order; a batch whose
earliest day does not strictly follow the last emitted day is a
backfill correction and is REJECTED rather than corrupting the walk.

Determinism mirrors q_cusum_drift: daily means are 12-dp decimal-exact,
the recursion is the shared cusum_walk IEEE add/max chain continued
from exact doubles — a replayed batch emits identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bifrost_spark.queries.monitor_ops import (
    cusum_baseline_frames,
    cusum_daily_frame,
    cusum_decisions,
    cusum_walk,
)


def fit_cusum_baseline(df: DataFrame) -> tuple[float, float]:
    """(mu0, s0) from a standing batch frame (e.g. the first week of
    events): the SAME first-_CUSUM_BASE_DAYS-days baseline spelling as
    q_cusum_drift, collected to two driver-held floats — durable by
    construction (they live in the caller, not on executors)."""
    daily = cusum_daily_frame(df)
    base, sd = cusum_baseline_frames(daily)
    mu0 = base.collect()[0]["mu0"]
    s0 = sd.collect()[0]["s0"]
    return float(mu0), float(s0)


def batch_cusum_update(
    batch: DataFrame, mu0: float, s0: float, sp0: float, sn0: float
) -> DataFrame:
    """One micro-batch of raw events → its days' CUSUM rows walked
    forward from the prior (sp0, sn0) state, with the raw state columns
    appended for the next batch's recovery."""
    spark = batch.sparkSession
    daily = cusum_daily_frame(batch).select("day", "m")
    base = spark.createDataFrame([(mu0,)], "mu0 double")
    sd = spark.createDataFrame([(s0,)], "s0 double")
    rows = cusum_walk(daily, base, sd, sp0=sp0, sn0=sn0)
    return cusum_decisions(rows).join(
        rows.select(
            "day",
            F.col("sp").alias("sp_exact"),
            F.col("sn").alias("sn_exact"),
        ),
        "day",
    )


def _prior_state(
    spark, output_path: str, batch_id: int
) -> tuple[float, float, object]:
    """(sp, sn, max_day) from the max-day row over output partitions
    with batch_id strictly below the current one.  Only the missing-path
    first-batch case resets to (0, 0, None); any other read error
    propagates so the micro-batch retries (the sprt_monitor ADVICE-r8
    contract)."""
    from bifrost_spark.streaming._sink import output_exists

    if not output_exists(spark, output_path):
        return 0.0, 0.0, None
    prior = spark.read.parquet(output_path).filter(F.col("batch_id") < batch_id)
    row = prior.orderBy(F.desc("day")).limit(1).collect()
    if not row:
        return 0.0, 0.0, None
    return float(row[0]["sp_exact"]), float(row[0]["sn_exact"]), row[0]["day"]


def start_cusum_monitor(
    stream: DataFrame,
    mu0: float,
    s0: float,
    output_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Start the monitor on a stream of raw events: each micro-batch
    folds its days' means, continues the walk from the output-carried
    (S+, S−), and emits per-day decision+state rows to the
    batch_id-partitioned replay-idempotent sink."""

    def _emit(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from bifrost_spark.streaming._sink import write_batch_partition

        spark = batch.sparkSession
        sp0, sn0, max_day = _prior_state(spark, output_path, batch_id)
        update = batch_cusum_update(batch, mu0, s0, sp0, sn0)
        if max_day is not None:
            update = update.localCheckpoint(eager=True)
            min_day = update.agg(F.min("day").alias("d")).collect()[0]["d"]
            if min_day is not None and min_day <= max_day:
                raise ValueError(
                    f"cusum_monitor: batch {batch_id} contains day "
                    f"{min_day} <= last emitted day {max_day}; late days "
                    "are backfill corrections, not monitor updates "
                    "(ordering contract)"
                )
        write_batch_partition(update, batch_id, output_path)

    return (
        stream.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
