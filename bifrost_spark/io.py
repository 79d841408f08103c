"""Batch sources and sinks.

The reference's I/O surface is: Kafka in (kafka.clj:143-175), gzip-framed
files out to S3/Azure under Hive-style keys (s3.clj:15-20).  The engine
generalizes both directions:

* sources — parquet (primary), ORC, CSV, JSON, and the archive layout
  written by streaming/archive.py (partition-discovered, prunable);
* sinks — partitioned columnar writes with zstd (preferred over the
  reference's gzip: faster decode at the same ratio), optional
  sort-within-partitions for row-group clustering, and bucketed tables for
  shuffle-free co-located joins downstream.

All paths accept any Hadoop-FS scheme (s3a://, abfss://, file://) — cloud
targeting is config, not code, exactly as in the reference (system.clj:32-39
dispatches on :cloud-storage :type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "csv", "json")


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Schema-explicit batch read.

    For CSV/JSON an explicit schema is REQUIRED: schema inference is a full
    extra pass over the data — at 100 TB that is a 100 TB read before the
    query starts.  Parquet/ORC carry their schema in footers (no pass).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {_FORMATS}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} source requires an explicit schema (no inference pass)")
    reader: DataFrameReader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    fmt: str = "parquet",
    mode: str = "error",
    compression: str = "zstd",
    sort_within: tuple[str, ...] = (),
    target_partitions: int | None = None,
) -> None:
    """Hive-partitioned columnar write (A11's layout, batch flavor).

    ``sort_within`` clusters rows inside each file → tighter min/max
    row-group stats → better data skipping for downstream range predicates.
    ``target_partitions`` repartitions by the partition columns first so
    each output directory gets O(1) files instead of one per task — the
    difference between 32 and 32,000 files per partition at cluster scale.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {_FORMATS}")
    out = df
    if target_partitions and partition_by:
        out = out.repartition(target_partitions, *partition_by)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.format(fmt).mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: tuple[str, ...],
    num_buckets: int,
    sort_by: tuple[str, ...] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table: joins/aggregations on the bucket key
    skip the shuffle entirely (Catalyst sees the bucketing as a satisfied
    hash distribution).  This is how two 50 TB fact tables join without
    moving either: bucket both by the join key at write time, pay the
    shuffle ONCE, then every subsequent join is map-side."""
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shuffle_cols: tuple[str, ...],
    seed: int = 0,
    fmt: str = "parquet",
    mode: str = "error",
    compression: str = "zstd",
) -> None:
    """Deterministically-shuffled shard writer — the LAST step of a
    training-data pipeline: documents must reach the trainer in a fixed
    pseudo-random order (SGD needs shuffled data; reproducible runs need
    the SAME shuffle every time), sliced into ``n_shards`` balanced files.

    The shuffle is content-derived, not RNG: order key =
    ``xxhash64(shuffle_cols..., seed)``.  Shard assignment is
    ``pmod(key, n_shards)`` and rows are sorted by the key WITHIN each
    shard — so output bytes are a pure function of (input, seed),
    identical under task retry, cluster size, and input partitioning
    (the property RNG-based ``orderBy(rand())`` cannot give: a retried
    stage would re-draw and produce different files).

    One range-repartition shuffle on the shard id: shard ids are already
    the dense integers 0..n_shards-1, so ``repartitionByRange`` never
    SPLITS a shard across tasks — ``partitionBy("shard")`` therefore still
    writes one file per shard.  (RangePartitioner samples to pick
    boundaries, so adjacent shard ids can occasionally COALESCE into one
    task when the sample misses a value — mild task skew, never split
    files.  Hash-repartitioning murmur3(shard) % n_shards would be worse:
    collisions grow with n_shards and leave tasks empty.)  xxhash64
    uniformity keeps shards within ~√ of
    equal row counts at any scale.  Each shard is exactly one file
    (``shard=<i>/part-*``), so the trainer's file list is the shard list.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    if not shuffle_cols:
        raise ValueError("shuffle_cols must name at least one column")
    from pyspark.sql import functions as F

    key = F.xxhash64(*shuffle_cols, F.lit(seed))
    out = (
        df.withColumn("_shuffle_key", key)
        .withColumn("shard", F.pmod(F.col("_shuffle_key"), F.lit(n_shards)).cast("int"))
        .repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", "_shuffle_key")
        .drop("_shuffle_key")
    )
    (
        out.write.format(fmt)
        .mode(mode)
        .option("compression", compression)
        .partitionBy("shard")
        .save(path)
    )
