"""bifrost-parity queries (SURVEY.md §2 Part A → M2).

The ``events`` fixture models the Kafka domain (FIXTURES.md): ``event_type``
≈ topic (kafka.clj:149), ``user_id % 4`` ≈ partition (kafka.clj:152),
``event_id`` ≈ offset (kafka.clj:57), ``ts`` ≈ arrival clock (kafka.clj:113),
``props`` ≈ opaque payload (kafka.clj:58).  Each query demonstrates the
*semantics* of a reference dataflow operator as a batch-relational statement;
the live streaming counterparts are in bifrost_spark/streaming/archive.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

# Reference defaults (etc/config.example.edn:6-9) — topic filter fixtures.
TOPIC_BLACKLIST = ("click",)
TOPIC_WHITELIST = None  # None → all topics pass (whitelist disabled)


def kafkaized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → the Kafka-message shape bifrost consumes (kafka.clj:56-67,152)
    and Spark's Kafka source exposes: topic/partition/offset/value.

    offset is log position *within* (topic, partition) — dense row_number in
    event order, exactly the per-partition ordering Kafka guarantees."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("topic"),
        F.pmod("user_id", F.lit(4)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.encode("props", "UTF-8").alias("value"),
        "ts",
    )


@query(
    "q_topic_discovery",
    oracle="SELECT DISTINCT event_type AS topic FROM events",
)
def q_topic_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-discovery scan (reference kafka.clj:16-41: ZK poll + set diff).
    Relational analog: the distinct topic set.  Streaming analog:
    ``subscribePattern`` — the broker, not the engine, does discovery."""
    return load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("topic")
    ).distinct()


@query(
    "q_topic_filter",
    oracle="""
        SELECT DISTINCT event_type AS topic
        FROM events
        WHERE event_type NOT IN ('click')
    """,
)
def q_topic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitelist∩ / blacklist− topic filter (kafka.clj:182-186):
    ``(if whitelist (∩ topics whitelist) topics) − blacklist``."""
    t = load_table(spark, sf_dir, "events").select(F.col("event_type").alias("topic")).distinct()
    if TOPIC_WHITELIST is not None:
        t = t.filter(F.col("topic").isin(list(TOPIC_WHITELIST)))
    return t.filter(~F.col("topic").isin(list(TOPIC_BLACKLIST)))


@query(
    "q_partition_demux",
    oracle="""
        SELECT event_type AS topic,
               CAST(user_id % 4 AS INT) AS partition,
               CAST(COUNT(*) AS BIGINT) AS n_messages
        FROM events
        GROUP BY event_type, CAST(user_id % 4 AS INT)
    """,
)
def q_partition_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed demux (kafka.clj:150-164, async.clj:16-35): route messages to
    per-(topic,partition) workers.  Relational analog: hash-distribute by the
    key and count per route.  In Spark the Kafka source is already
    partition-parallel; the groupBy is the demux's accounting."""
    msgs = kafkaized_events(spark, sf_dir)
    return msgs.groupBy("topic", "partition").agg(F.count("*").alias("n_messages"))


@query(
    "q_offset_bounds",
    oracle="""
        SELECT event_type AS topic,
               CAST(user_id % 4 AS INT) AS partition,
               MIN(event_id) AS first_offset,
               MAX(event_id) AS last_offset,
               CAST(COUNT(*) AS BIGINT) AS n_records
        FROM events
        GROUP BY event_type, CAST(user_id % 4 AS INT)
    """,
)
def q_offset_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MIN/MAX/COUNT fold (kafka.clj:61-67): per open file bifrost
    keeps first-offset (first seen = min in log order), last-offset (last
    seen = max) and a record meter.  Map-side partial agg = the same fold."""
    msgs = kafkaized_events(spark, sf_dir)
    return msgs.groupBy("topic", "partition").agg(
        F.min("offset").alias("first_offset"),
        F.max("offset").alias("last_offset"),
        F.count("*").alias("n_records"),
    )


@query(
    "q_tumbling_window",
    oracle="""
        SELECT event_type AS topic,
               DATE_TRUNC('minute', ts) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_records,
               MIN(event_id) AS first_offset,
               MAX(event_id) AS last_offset
        FROM events
        GROUP BY event_type, DATE_TRUNC('minute', ts)
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rotation (kafka.clj:103-120): bifrost closes a file per
    rotation-interval tick per (topic,partition); empty windows emit nothing
    (kafka.clj:88) — GROUP BY likewise emits no row for empty windows.
    Event-time analog of the processing-time trigger; streaming twin in
    streaming/archive.py uses trigger(processingTime=...)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 minute")
    return (
        ev.groupBy(F.col("event_type").alias("topic"), win)
        .agg(
            F.count("*").alias("n_records"),
            F.min("event_id").alias("first_offset"),
            F.max("event_id").alias("last_offset"),
        )
        .select(
            "topic",
            F.col("window.start").alias("window_start"),
            "n_records",
            "first_offset",
            "last_offset",
        )
    )


@query(
    "q_session_window",
    oracle="""
        WITH gaps AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN ts - LAG(ts) OVER w > INTERVAL 5 MINUTE
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, event_id, ts,
                 SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_id
          FROM gaps
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (5-minute inactivity gap) via the lag+cumsum
    construction — the scale-correct pattern: one shuffle on user_id, no
    state store.  Streaming twin: ``session_window(ts, '5 minutes')``
    (exercised in streaming tests; not DuckDB-expressible as a stream)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-precision gap so the 5-minute boundary compare matches the
    # oracle's INTERVAL arithmetic exactly (events.ts carries sub-second).
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(gap.isNull() | (gap > 300 * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_session).over(cum).cast("bigint").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "q_object_keys",
    oracle="""
        SELECT event_type AS topic,
               CAST(user_id % 4 AS INT) AS partition,
               printf('%s/%s/partition=%d/%010d.baldr.gz',
                      'bifrost-group', event_type, CAST(user_id % 4 AS INT),
                      MIN(event_id)) AS object_key
        FROM events
        GROUP BY event_type, CAST(user_id % 4 AS INT)
    """,
)
def q_object_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned object-key generation (s3.clj:15-20, azureblob.clj:13-18):
    ``<group>/<topic>/partition=<p>/<%010d first-offset>.baldr.gz``.  Naming by
    first-offset makes crash re-uploads idempotent (same key → overwrite)."""
    msgs = kafkaized_events(spark, sf_dir)
    bounds = msgs.groupBy("topic", "partition").agg(F.min("offset").alias("first_offset"))
    return bounds.select(
        "topic",
        "partition",
        # NULL-guarded: format_string renders a NULL topic as the string
        # "null" where the oracle's printf yields NULL — a topicless
        # message has no well-formed object key on either engine
        # (fuzzer catch, round 10)
        F.when(
            F.col("topic").isNotNull(),
            F.format_string(
                "%s/%s/partition=%d/%010d.baldr.gz",
                F.lit("bifrost-group"),
                F.col("topic"),
                F.col("partition"),
                F.col("first_offset"),
            ),
        ).alias("object_key"),
    )


@query(
    "q_commit_offsets",
    oracle="""
        SELECT event_type AS topic,
               CAST(user_id % 4 AS INT) AS partition,
               MAX(event_id) + 1 AS commit_offset
        FROM events
        GROUP BY event_type, CAST(user_id % 4 AS INT)
    """,
)
def q_commit_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-upload offset commit arithmetic (s3.clj:63-66): bifrost commits
    ``last-offset + 1`` to ZooKeeper iff the upload succeeded (A14 FSM).  The
    engine's streaming twin is the checkpoint commit log; this asserts the
    +1 semantics relationally."""
    msgs = kafkaized_events(spark, sf_dir)
    return msgs.groupBy("topic", "partition").agg(
        (F.max("offset") + 1).alias("commit_offset")
    )
