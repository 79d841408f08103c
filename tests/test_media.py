"""Pure-numpy media codecs (operators/media.py) + the multimodal kernels
that use them: encode/decode round-trips, resize against an independent
reference, decode-dispatch behavior, and end-to-end kernel values.
"""

from __future__ import annotations

import numpy as np
import pytest

from bifrost_spark.operators.media import (
    decode_media,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    resize_nearest,
    sniff,
)


def test_ppm_round_trip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(11, 5, 3), dtype=np.uint8)
    out = decode_ppm(encode_ppm(img))
    assert out.shape == (11, 5, 3)
    assert np.array_equal(out, img)


def test_ppm_header_comment_tolerated():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = encode_ppm(img)
    # inject a netpbm comment line between magic and dimensions
    commented = b"P6\n# generated\n" + raw[3:]
    assert np.array_equal(decode_ppm(commented), img)


def test_wav_round_trip():
    samples = (np.arange(-500, 500, 7)).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_wav_rejects_non_pcm():
    raw = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    raw[20] = 2  # audio_format = 2 (ADPCM) — compressed
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(raw))


def test_resize_nearest_matches_reference():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    out = resize_nearest(img, 4, 4)
    # independent reference: explicit per-pixel center mapping
    ref = np.empty((4, 4, 3), dtype=np.uint8)
    for r in range(4):
        for c in range(4):
            ref[r, c] = img[min(int((r + 0.5) * 10 / 4), 9), min(int((c + 0.5) * 6 / 4), 5)]
    assert np.array_equal(out, ref)


def test_resize_identity_when_same_size():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(resize_nearest(img, 4, 4), img)


def test_sniff_and_dispatch():
    img = encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    wav = encode_wav(np.zeros(4, dtype=np.int16))
    assert sniff(img) == "ppm"
    assert sniff(wav) == "wav"
    assert sniff(b"MJPG\x00\x00") == "unknown"
    kind, arr = decode_media(img, "image")
    assert kind == "image" and arr.shape == (2, 2, 3)
    kind, (samples, rate) = decode_media(wav, "audio")
    assert kind == "audio" and len(samples) == 4
    with pytest.raises(NotImplementedError):
        decode_media(b"MJPG" + b"\x00" * 16, "video")


def test_encoded_table_and_kernels_end_to_end(spark, sf_dir):
    """The Spark-side pipeline produces exactly what the codecs predict:
    resize output equals an independently computed PPM for a sample doc,
    and audio RMS matches a direct numpy computation."""
    from bifrost_spark.queries.multimodal import (
        _IMG_W,
        encoded_media_table,
    )
    from bifrost_spark import registry

    enc = encoded_media_table(spark, sf_dir)
    sample = (
        enc.filter(enc.media_type == "image").orderBy("media_id").limit(1).collect()
    )[0]
    img = decode_ppm(bytes(sample.payload))
    assert img.shape[1] == _IMG_W

    # q_multimodal_resize row for that media_id must equal the local result
    import hashlib

    expected = encode_ppm(resize_nearest(img, 8, 8))
    row = (
        registry.queries()["q_multimodal_resize"](spark, sf_dir)
        .filter(f"media_id = {sample.media_id}")
        .collect()
    )[0]
    assert row.resized_md5 == hashlib.md5(expected).hexdigest()
    assert row.resized_bytes == len(expected)
    assert (row.out_h, row.out_w) == (8, 8)

    # audio feature row matches a direct numpy RMS
    audio = (
        enc.filter(enc.media_type == "audio").orderBy("media_id").limit(1).collect()
    )[0]
    samples, rate = decode_wav(bytes(audio.payload))
    a = samples.astype(np.int64)
    want_rms = float(int((a * a).sum()) / len(a)) ** 0.5
    feat = (
        registry.queries()["q_multimodal_features"](spark, sf_dir)
        .filter(f"media_id = {audio.media_id}")
        .collect()
    )[0]
    assert feat.kind == "audio"
    assert feat.n_values == len(samples)
    assert feat.rms_val == pytest.approx(want_rms, rel=0, abs=1e-9)

    # compressed payloads fall back to opaque byte stats, never crash
    vid = (
        registry.queries()["q_multimodal_features"](spark, sf_dir)
        .filter("kind = 'opaque'")
        .count()
    )
    assert vid > 0


def test_empty_payload_decode_agrees_with_oracle(spark):
    """Empty-text image documents: the encoder clamps the raster to one row,
    so the decoded height is 1 — and the DuckDB oracle must predict the
    same (greatest(1, ceil(...)) mirror of the encode-side max(1, ...))."""
    import duckdb

    from bifrost_spark.queries.multimodal import (
        _DECODE_SCHEMA,
        _decode_meta,
        _encode_media,
        _ENCODED_SCHEMA,
    )
    from bifrost_spark.registry import REGISTRY

    src = spark.createDataFrame(
        [(0, "image", bytearray(b"")), (3, "image", bytearray(b"x"))],
        "media_id long, media_type string, payload binary",
    )
    decoded = (
        src.mapInPandas(_encode_media, _ENCODED_SCHEMA)
        .mapInPandas(_decode_meta, _DECODE_SCHEMA)
        .orderBy("media_id")
        .collect()
    )
    assert [(r.media_id, r.height) for r in decoded] == [(0, 1), (3, 1)]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES (0, 'src', ''),"
        " (3, 'src', 'x')) t(doc_id, source, text)"
    )
    oracle = con.execute(
        REGISTRY["q_multimodal_decode"].oracle + " ORDER BY media_id"
    ).fetchall()
    assert [(r[0], r[3]) for r in oracle] == [(0, 1), (3, 1)]


def test_patch_kernel_matches_numpy_reference(spark):
    """q_multimodal_patches vs an independent from-scratch patchify: same
    grid, same digests, same integer-exact means — and batching must not
    matter (forced 3-row Arrow batches)."""
    import hashlib

    import numpy as np

    from bifrost_spark.operators.media import decode_ppm, encode_ppm
    from bifrost_spark.queries.multimodal import (
        _PATCH,
        _PATCH_SCHEMA,
        _patch_kernel,
    )

    rng = np.random.default_rng(7)
    imgs = {
        # (h, w): grid of (h//P, w//P); includes crop remainders and
        # a sub-patch-size image that must emit nothing
        1: rng.integers(0, 256, (17, 16, 3), dtype=np.uint8),
        2: rng.integers(0, 256, (8, 24, 3), dtype=np.uint8),
        3: rng.integers(0, 256, (5, 6, 3), dtype=np.uint8),
        4: rng.integers(0, 256, (32, 8, 3), dtype=np.uint8),
    }
    src = spark.createDataFrame(
        [(mid, bytearray(encode_ppm(img))) for mid, img in imgs.items()],
        "media_id long, payload binary",
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        got = {
            (r.media_id, r.patch_row, r.patch_col): (r.patch_md5, r.mean_val)
            for r in src.mapInPandas(_patch_kernel, _PATCH_SCHEMA).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    want = {}
    P = _PATCH
    for mid, img in imgs.items():
        for r in range(img.shape[0] // P):
            for c in range(img.shape[1] // P):
                patch = img[r * P : (r + 1) * P, c * P : (c + 1) * P]
                want[(mid, r, c)] = (
                    hashlib.md5(np.ascontiguousarray(patch).tobytes()).hexdigest(),
                    int(patch.astype(np.int64).sum()) / (P * P * 3),
                )
    assert got == want
    assert not any(k[0] == 3 for k in got)  # sub-patch image emits nothing


def test_corrupt_payloads_skip_not_crash(spark):
    """One corrupt payload must NEVER kill a decode job (the junk-partition
    class at corpus scale): every decode kernel skips (or falls back to
    opaque stats for features) and still emits the valid rows.  Junk
    shapes: truncated raster, garbage magic, unsupported maxval, truncated
    header, truncated WAV chunk table, empty bytes."""
    from bifrost_spark.operators.media import encode_ppm, encode_wav
    from bifrost_spark.queries.multimodal import (
        _DECODE_SCHEMA,
        _FEATURE_SCHEMA,
        _PATCH_SCHEMA,
        _RESIZE_SCHEMA,
        _decode_meta,
        _extract_features,
        _patch_kernel,
        _resize_kernel,
    )

    rng = np.random.RandomState(7)
    good_img = encode_ppm(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8))
    good_wav = encode_wav((rng.randint(-100, 100, 64)).astype(np.int16))
    junk = [
        good_img[: len(good_img) // 2],      # truncated raster
        b"GIF89a" + b"\x00" * 20,            # undecodable magic
        b"P6\n2 2\n999\n" + b"\x00" * 12,    # unsupported maxval
        b"P6\n2",                            # truncated header
        good_wav[:14],                       # truncated WAV chunk table
        b"RIFF\x00\x00\x00\x00WAVE",         # WAV with no chunks
        b"",                                 # empty payload
    ]
    rows = [(0, "image", bytearray(good_img)), (1, "audio", bytearray(good_wav))]
    rows += [(10 + i, "image", bytearray(j)) for i, j in enumerate(junk)]
    src = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )

    decoded = src.mapInPandas(_decode_meta, _DECODE_SCHEMA).collect()
    assert sorted(r.media_id for r in decoded) == [0, 1]

    img_side = src.filter("media_type = 'image'")
    resized = img_side.mapInPandas(_resize_kernel, _RESIZE_SCHEMA).collect()
    assert [r.media_id for r in resized] == [0]

    patches = img_side.mapInPandas(_patch_kernel, _PATCH_SCHEMA).collect()
    assert {r.media_id for r in patches} == {0}

    feats = {r.media_id: r.kind
             for r in src.mapInPandas(_extract_features, _FEATURE_SCHEMA).collect()}
    assert feats[0] == "image" and feats[1] == "audio"
    # junk payloads degrade to opaque byte stats, they don't vanish or raise
    assert all(feats[10 + i] == "opaque" for i in range(len(junk)))
