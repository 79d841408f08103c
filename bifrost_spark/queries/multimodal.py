"""Multimodal-column operators (driver mandate): image/audio/video payloads
as opaque ``binary`` columns with typed metadata.

The fixture set has no real media, so payloads are built deterministically
from ``documents.text``: ``media_table`` keeps the raw UTF-8 bytes (the
opaque-blob discipline — exactly how the reference treats Kafka payloads
it never inspects, kafka.clj:58), while ``encoded_media_table`` wraps the
same bytes into REAL containers — binary PPM (P6) images and RIFF/PCM16
WAV audio — that the engine then genuinely decodes, resizes, and
feature-extracts with the pure-numpy codecs in ``operators/media.py``.
Compressed codecs (the "video" payloads carry a fake MJPG container)
remain a documented ``NotImplementedError``: swapping that fallthrough for
a real codec call is the only production change, and every Spark-side
piece — schema, Arrow batching, partitioning, round-trip — is exercised
for real on the uncompressed path.
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
    StringType,
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
    """Decode an opaque binary payload: REAL for uncompressed formats
    (binary PPM images, PCM16 WAV audio — pure-numpy codecs in
    operators/media.py), ``NotImplementedError`` for compressed codecs
    (JPEG/H.264/MP3 need libraries absent in this container)."""
    from bifrost_spark.operators.media import decode_media as _decode

    return _decode(payload, media_type)


_IMG_W = 16  # encoded image width (3 bytes/pixel → 48 payload bytes per row)
_WAV_RATE = 8000  # PCM sample rate for encoded audio


def _encode_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched media ENCODE: text bytes → real containers.

    * image: bytes as RGB pixels, width 16, zero-padded to full rows →
      binary PPM (P6).
    * audio: each byte → a centered int16 sample, 8 kHz mono → RIFF/PCM16.
    * video: fake MJPG container (compressed-codec stand-in; decode raises).
    """
    import numpy as np

    from bifrost_spark.operators.media import encode_ppm, encode_wav

    for pdf in batches:
        payloads = []
        for raw, kind in zip(pdf["payload"], pdf["media_type"]):
            b = np.frombuffer(raw, dtype=np.uint8)
            if kind == "image":
                h = max(1, -(-len(b) // (_IMG_W * 3)))
                buf = np.zeros(h * _IMG_W * 3, dtype=np.uint8)
                buf[: len(b)] = b
                payloads.append(encode_ppm(buf.reshape(h, _IMG_W, 3)))
            elif kind == "audio":
                samples = (b.astype(np.int16) - 128) * 256
                payloads.append(encode_wav(samples, _WAV_RATE))
            else:
                payloads.append(b"MJPG" + len(b).to_bytes(8, "big") + raw)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].values,
                "media_type": pdf["media_type"].values,
                "payload": payloads,
            }
        )


_ENCODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def encoded_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media_table with payloads wrapped in REAL containers (PPM/WAV/fake
    MJPG) — the input side of the decode/resize/feature kernels."""
    # NULL payloads (source rows whose text never extracted) cannot be
    # wrapped in a container — the encode kernel requires bytes; dropped
    # here exactly as a production encoder would skip-and-count them
    # (fuzzer finding: np.frombuffer(None) kills the Arrow batch)
    m = (
        media_table(spark, sf_dir)
        .select("media_id", "media_type", "payload")
        .filter(F.col("payload").isNotNull())
    )
    return m.mapInPandas(_encode_media, _ENCODED_SCHEMA)


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_values", LongType()),
        StructField("mean_val", DoubleType()),
        StructField("rms_val", DoubleType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction with REAL decode on the
    uncompressed path: images → pixel mean + RMS over the decoded raster,
    audio → sample mean + RMS (the classic loudness signal).  Compressed
    payloads (fake-MJPG "video") fall back to opaque byte stats — exactly
    what a production extractor does with an undecodable blob.  All sums
    accumulate in int64 (exact), so the emitted doubles are deterministic
    regardless of batch split."""
    import numpy as np

    from bifrost_spark.operators.media import DECODE_ERRORS
    from bifrost_spark.operators.media import decode_media as _decode

    for pdf in batches:
        rows = []
        for mid, kind, payload in zip(
            pdf["media_id"], pdf["media_type"], pdf["payload"]
        ):
            try:
                decoded_kind, value = _decode(payload, kind)
                arr = value.ravel() if decoded_kind == "image" else value[0]
            except DECODE_ERRORS:
                # undecodable blob — compressed codec OR corrupt payload
                # (truncated raster, bad header): opaque byte stats, the
                # production-extractor fallback; never kill the job
                decoded_kind, arr = "opaque", np.frombuffer(payload, dtype=np.uint8)
            a = arr.astype(np.int64)
            n = len(a)
            mean = float(int(a.sum()) / n) if n else 0.0
            rms = float(int((a * a).sum()) / n) ** 0.5 if n else 0.0
            rows.append((mid, decoded_kind, n, mean, rms))
        yield pd.DataFrame(
            rows, columns=["media_id", "kind", "n_values", "mean_val", "rms_val"]
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


_RESIZE_H, _RESIZE_W = 8, 8


def _resize_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Binary-in/binary-out Arrow transform: REAL decode (PPM) →
    nearest-neighbor resize to 8×8 → re-encode (PPM).  Deterministic: same
    payload → same resized bytes on every executor."""
    from bifrost_spark.operators.media import (
        DECODE_ERRORS,
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    for pdf in batches:
        ids, out = [], []
        for mid, p in zip(pdf["media_id"], pdf["payload"]):
            try:
                resized = encode_ppm(
                    resize_nearest(decode_ppm(p), _RESIZE_H, _RESIZE_W)
                )
            except DECODE_ERRORS:
                continue  # corrupt payload: skip-and-drop, never kill the job
            ids.append(mid)
            out.append(resized)
        yield pd.DataFrame(
            {
                "media_id": ids,
                "resized_payload": out,
                "out_w": [_RESIZE_W] * len(ids),
                "out_h": [_RESIZE_H] * len(ids),
            }
        )


@query("q_multimodal_resize", oracle=None)  # binary md5 output → rows-only
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pipeline: PPM payloads through an Arrow-batched
    decode → nearest-neighbor 8×8 → re-encode kernel (operators/media.py —
    a real codec path, not a stub; tests/test_media.py pins the resized
    bytes against an independent numpy reference).  The binary result is
    projected to digest+length at the query boundary (the external checker
    canonicalizes via pandas sort/hash; raw bytes stay inside the
    pipeline)."""
    m = encoded_media_table(spark, sf_dir).filter(F.col("media_type") == "image")
    resized = m.select("media_id", "payload").mapInPandas(
        _resize_kernel, _RESIZE_SCHEMA
    )
    return resized.select(
        "media_id",
        F.md5("resized_payload").alias("resized_md5"),
        F.length("resized_payload").cast("bigint").alias("resized_bytes"),
        "out_w",
        "out_h",
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def _decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode of every uncompressed payload → typed geometry.
    Corrupt payloads are skipped, never fatal (production would route them
    to a quarantine sink); the fixture encode path only produces valid
    containers, so the DuckDB oracle's arithmetic row set is unaffected."""
    from bifrost_spark.operators.media import DECODE_ERRORS
    from bifrost_spark.operators.media import decode_media as _decode

    for pdf in batches:
        rows = []
        for mid, kind, payload in zip(
            pdf["media_id"], pdf["media_type"], pdf["payload"]
        ):
            try:
                decoded_kind, value = _decode(payload, kind)
            except DECODE_ERRORS:
                continue  # corrupt payload: skip-and-drop, never kill the job
            if decoded_kind == "image":
                h, w = value.shape[:2]
                rows.append((mid, kind, w, h, None, None))
            else:
                samples, rate = value
                n = len(samples)
                rows.append((mid, kind, None, None, n, n * 1000 // rate))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id",
                "media_type",
                "width",
                "height",
                "n_samples",
                "duration_ms",
            ],
        )


@query(
    "q_multimodal_decode",
    oracle=f"""
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' ELSE 'audio'
               END AS media_type,
               CASE WHEN CAST(doc_id % 3 AS INT) = 0
                    THEN CAST({_IMG_W} AS BIGINT) END AS width,
               CASE WHEN CAST(doc_id % 3 AS INT) = 0
                    -- greatest(1, ...) mirrors the encoder's height clamp:
                    -- a PPM raster has at least one row even for an empty
                    -- payload (zero-padded), so decode reports height 1
                    THEN CAST(greatest(1, ceil(
                             octet_length(encode(text)) / {_IMG_W * 3}.0))
                              AS BIGINT) END AS height,
               CASE WHEN CAST(doc_id % 3 AS INT) = 1
                    THEN CAST(octet_length(encode(text)) AS BIGINT)
               END AS n_samples,
               CASE WHEN CAST(doc_id % 3 AS INT) = 1
                    -- integer floor division: DuckDB CAST(double) ROUNDS,
                    -- the decode kernel floors (n * 1000 // rate)
                    THEN CAST((octet_length(encode(text)) * 1000) // {_WAV_RATE}
                              AS BIGINT) END AS duration_ms
        FROM documents
        WHERE CAST(doc_id % 3 AS INT) IN (0, 1)
          -- a NULL payload (failed extraction) cannot round-trip; the
          -- encode path drops it (fuzzer finding)
          AND text IS NOT NULL
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end codec round-trip, oracle-checked: encode text bytes into
    real PPM/WAV containers, then DECODE them back in an Arrow-batched
    kernel and emit the decoded geometry (image width/height, audio
    sample count/duration).  The DuckDB oracle predicts every value
    arithmetically from the text's byte length — so a hash match proves
    the encoder, the decoder, and the byte layout all agree.  Compressed
    ("video") payloads are excluded: their decode raises by design."""
    m = encoded_media_table(spark, sf_dir).filter(
        F.col("media_type").isin("image", "audio")
    )
    return m.mapInPandas(_decode_meta, _DECODE_SCHEMA)


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


@query("q_multimodal_features", oracle=None)  # float features → rows-only
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    mapInPandas, with REAL decode of the PPM/WAV payloads (see
    _extract_features; tests/test_media.py pins values against an
    independent numpy reference).  Repartitions by media_id so extraction
    parallelism is independent of the source file layout — at 100 TB the
    decode is the bottleneck, so partition count is sized to the
    Python-worker fleet, not to input splits."""
    m = encoded_media_table(spark, sf_dir).repartition(F.col("media_id"))
    return m.select("media_id", "media_type", "payload").mapInPandas(
        _extract_features, _FEATURE_SCHEMA
    )


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
               -- octet_length of the UTF-8 payload, not LENGTH(text):
               -- those differ on any non-ASCII character (fuzzer finding)
               CAST(octet_length(encode(d.text)) AS BIGINT) AS payload_bytes,
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


_PATCH = 8  # ViT-style square patch side

_PATCH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("patch_row", LongType()),
        StructField("patch_col", LongType()),
        StructField("patch_md5", StringType()),
        StructField("mean_val", DoubleType()),
    ]
)


def _patch_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched ViT-style patchify: decode PPM → crop to the patch
    grid → emit one row per non-overlapping {P}×{P} patch with its byte
    digest and integer-exact mean intensity.  Vectorized: the raster is
    reshaped to (rows, P, cols, P, 3) once; no per-pixel Python."""
    import hashlib

    import numpy as np

    from bifrost_spark.operators.media import DECODE_ERRORS, decode_ppm

    P = _PATCH
    for pdf in batches:
        out = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            try:
                img = decode_ppm(bytes(payload))
            except DECODE_ERRORS:
                continue  # corrupt payload: skip-and-drop, never kill the job
            h, w = img.shape[:2]
            nr, nc = h // P, w // P
            if nr == 0 or nc == 0:
                continue  # smaller than one patch → no rows (documented)
            grid = (
                img[: nr * P, : nc * P]
                .reshape(nr, P, nc, P, 3)
                .transpose(0, 2, 1, 3, 4)  # (nr, nc, P, P, 3)
            )
            sums = grid.astype(np.int64).sum(axis=(2, 3, 4))
            denom = P * P * 3
            for r in range(nr):
                for c in range(nc):
                    patch = np.ascontiguousarray(grid[r, c])
                    out.append(
                        (
                            mid,
                            r,
                            c,
                            hashlib.md5(patch.tobytes()).hexdigest(),
                            float(int(sums[r, c]) / denom),
                        )
                    )
        yield pd.DataFrame(
            out,
            columns=["media_id", "patch_row", "patch_col", "patch_md5", "mean_val"],
        )


@query("q_multimodal_patches", oracle=None)  # decoded rasters → rows-only
def q_multimodal_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction: every image payload decoded (REAL PPM
    codec) and split into non-overlapping {P}×{P} patches, one output row
    per patch with its byte digest and mean intensity — the vision
    transformer's preprocessing contract (image → patch sequence), and
    the unit the downstream patch-embedding matmul consumes.

    Remainder pixels beyond the patch grid are cropped (the fixture
    images are width-16 → exactly 2 patch columns; production pipelines
    resize to a grid multiple first — q_multimodal_resize is that step).
    Determinism: patch means come from int64 pixel sums divided once;
    patch identity is the md5 of the raw patch bytes, so the output is
    exact under any batching/partitioning (pinned against an independent
    numpy reference in tests/test_media.py).

    Scale: decode+patchify runs Arrow-batched in mapInPandas with the
    same repartition-by-id discipline as q_multimodal_features — Python
    work scales with the worker fleet; only (id, digest, mean) rows ever
    shuffle, raster bytes stay inside the kernel."""
    m = (
        encoded_media_table(spark, sf_dir)
        .filter(F.col("media_type") == "image")
        .repartition(F.col("media_id"))
    )
    return m.select("media_id", "payload").mapInPandas(
        _patch_kernel, _PATCH_SCHEMA
    )
