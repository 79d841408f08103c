"""Multimodal-column operators (driver mandate): image/audio/video payloads
as opaque ``binary`` columns with typed metadata.

The fixture set has no real media, so the *payload* is a deterministic
UTF-8-encoded stand-in built from ``documents.text`` — exactly how the
reference treats Kafka payloads as opaque bytes it never inspects
(kafka.clj:58).  What IS real and tested here is the Spark-side plumbing:
binary schema, metadata projection, md5 integrity, and the Arrow-batched
``mapInPandas`` feature-extraction shape.  The actual media decode is a
clearly-marked stub (see ``decode_media``) because codec libraries are not
in this container.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from bifrost_spark.registry import query
from bifrost_spark.tables import load_table


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (media_id, media_type, payload binary, meta…).

    In production this is the parquet schema for a multimodal lake:
    ``payload BINARY`` + typed metadata columns, partitioned by media_type —
    the binary stays opaque to Catalyst exactly like bifrost's message bytes.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("origin"),
    )


def decode_media(payload: bytes, media_type: str):
    """STUB — real media decode (PIL/ffmpeg/librosa) is not available in this
    container.  The Spark plumbing around it (schema, batching, partitioning)
    is real; swap this body for the actual decoder in production."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("max_byte", LongType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic byte-level stats stand in for the decoded-media features
    (embedding, resolution, duration…).  This is the exact mapInPandas shape
    a real extractor uses: binary column in, fixed-schema features out, one
    Python worker per partition, Arrow transfer both ways.
    """
    import numpy as np

    for pdf in batches:
        arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].values,
                "n_bytes": [len(a) for a in arrs],
                # int sum / int len: single exact division, deterministic
                "mean_byte": [float(int(a.sum()) / len(a)) if len(a) else 0.0 for a in arrs],
                "max_byte": [int(a.max()) if len(a) else 0 for a in arrs],
            }
        )


@query(
    "q_multimodal_meta",
    oracle="""
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
               md5(text) AS payload_md5,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
               source AS origin
        FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: content md5 (the integrity
    check the reference's Azure path does via setStoreBlobContentMD5,
    azureblob.clj:31-35) + byte length + media_type routing key.  All
    JVM-side; the binary never crosses into Python."""
    m = media_table(spark, sf_dir)
    return m.select(
        "media_id",
        "media_type",
        F.md5("payload").alias("payload_md5"),
        F.length("payload").cast("bigint").alias("payload_bytes"),
        "origin",
    )


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("resized_payload", BinaryType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
    ]
)


def _resize_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Binary-in/binary-out Arrow transform — the resize pipeline shape.

    A real implementation decodes, resizes to (out_w, out_h), re-encodes
    (see decode_media for why that is stubbed); the stand-in emits a
    deterministic byte prefix so the full binary round-trip through Arrow
    (bytes → Python → bytes) is exercised and testable."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].values,
                "resized_payload": [bytes(p[:256]) for p in pdf["payload"]],
                "out_w": [256] * len(pdf),
                "out_h": [256] * len(pdf),
            }
        )


@query("q_multimodal_resize", oracle=None)  # stubbed kernel → rows-only
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pipeline shape: binary payloads through an Arrow-batched
    transform and back out as binary + typed dimensions.  The decode/encode
    kernel is stubbed (decode_media); the schema, batching, and round-trip
    are real.  The binary result is projected to digest+length at the query
    boundary (the external checker canonicalizes via pandas sort/hash; the
    raw bytes stay inside the pipeline)."""
    m = media_table(spark, sf_dir).filter(F.col("media_type") == "image")
    resized = m.select("media_id", "payload").mapInPandas(_resize_stub, _RESIZE_SCHEMA)
    return resized.select(
        "media_id",
        F.md5("resized_payload").alias("resized_md5"),
        F.length("resized_payload").cast("bigint").alias("resized_bytes"),
        "out_w",
        "out_h",
    )


@query(
    "q_multimodal_frames",
    oracle="""
        SELECT doc_id AS media_id,
               CAST(i AS BIGINT) AS frame_idx,
               CAST(i * 100 AS BIGINT) AS byte_offset
        FROM (
          SELECT doc_id,
                 CAST(floor(octet_length(encode(text)) / 100) AS BIGINT) AS n_frames
          FROM documents
          WHERE CAST(doc_id % 3 AS INT) = 2
        ),
        UNNEST(range(0, n_frames, 5)) AS t(i)
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads: every 5th frame index with its byte
    offset, frame count derived from payload size (the deterministic stand-in
    for container parsing).  Pure JVM sequence+explode — the sampling plan
    (which frames to decode) never touches Python; only the decode of the
    SELECTED frames would, keeping Python work proportional to sampled
    frames, not total footage."""
    m = media_table(spark, sf_dir).filter(F.col("media_type") == "video")
    n_frames = F.floor(F.length("payload") / 100).cast("bigint")
    # sequence() rejects an empty 0..-1 range — payloads under one frame
    # emit no rows (matches the oracle's empty range())
    m = m.filter(n_frames > 0)
    return (
        m.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), n_frames - 1, F.lit(5).cast("bigint"))
            ).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") >= 0)
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * 100).cast("bigint").alias("byte_offset"),
        )
    )


@query("q_multimodal_features", oracle=None)  # mapInPandas path → rows-only
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched mapInPandas
    (decode step stubbed — see decode_media).  Repartitions by media_id so
    extraction parallelism is independent of the source file layout — at
    100 TB the decode is the bottleneck, so partition count is sized to the
    Python-worker fleet, not to input splits."""
    m = media_table(spark, sf_dir).repartition(F.col("media_id"))
    return m.select("media_id", "payload").mapInPandas(_extract_features, _FEATURE_SCHEMA)


@query(
    "q_multimodal_dedup",
    oracle="""
        SELECT md5(text) AS digest,
               MIN(doc_id) AS keeper_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup: group by md5 of the payload BYTES, keep
    the lowest media_id as the canonical copy.

    The binary twin of q_dedup_exact: only 16-byte digests + ids shuffle,
    never the payloads — at 100 TB of media that is the entire difference
    between a feasible job and an infeasible one.  The oracle hashes the
    source text (the payload is its exact UTF-8 encoding, so the md5 hex
    is identical)."""
    m = media_table(spark, sf_dir)
    return m.groupBy(F.md5("payload").alias("digest")).agg(
        F.min("media_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@query(
    "q_multimodal_pair",
    oracle="""
        SELECT d.doc_id AS media_id,
               ['image', 'audio', 'video'][(d.doc_id % 3) + 1] AS media_type,
               CAST(LENGTH(d.text) AS BIGINT) AS payload_bytes,
               e.label AS embedding_label
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    """,
)
def q_multimodal_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pairing: join each media payload with its precomputed
    embedding row by shared id — the lakehouse step that assembles
    (payload, embedding) training pairs before contrastive training.

    Equi-join on the id; at scale both tables hash-partition on it (or the
    embedding side broadcasts if it is the small curated subset).  Payload
    bytes stay out of the compared output — only sizes and labels — the
    same never-ship-the-blob discipline as the dedup."""
    m = media_table(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    return m.join(e, m.media_id == e.vec_id).select(
        "media_id",
        "media_type",
        F.length("payload").cast("bigint").alias("payload_bytes"),
        F.col("label").alias("embedding_label"),
    )
