"""Pure-numpy media codecs for UNCOMPRESSED formats.

The container has no codec libraries (PIL/ffmpeg/librosa), but two classic
uncompressed formats need none — they are public byte layouts decodable
with stdlib ``struct`` + numpy:

* **PPM (P6)** — the netpbm binary RGB image format: ASCII header
  ``P6 <width> <height> <maxval>\\n`` followed by height×width×3 raw bytes.
* **WAV (RIFF/PCM16)** — canonical RIFF container with an ``fmt `` chunk
  (audio_format=1 ⇒ uncompressed PCM) and a ``data`` chunk of int16
  little-endian samples.

These make the engine's multimodal path REAL end-to-end for uncompressed
media: encode → store as an opaque binary column → decode → resize /
feature-extract, all inside Arrow-batched ``mapInPandas`` kernels.
Compressed codecs (JPEG/H.264/MP3…) remain a documented
``NotImplementedError`` — swapping ``decode_media``'s fallthrough for a
real codec call is the only production change.

Everything here is per-record CPU work with zero cross-record state — it
parallelizes embarrassingly under mapInPandas, so the 100 TB story is
purely "size the Python-worker fleet"; no shuffle, no skew, no driver
involvement.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {img.shape}")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8.  Whitespace/comment-tolerant
    header parse per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # Header = magic + 3 ASCII ints separated by whitespace/comments, then
    # ONE whitespace byte before the raster.
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM (maxval 255) supported")
    raster = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=i)
    return raster.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pixel-center sampling (the standard
    ``src = floor((dst + 0.5) * scale)`` mapping)."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[rows][:, cols]


# ---------------------------------------------------------------------------
# WAV (RIFF / PCM16 mono)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE with a canonical fmt+data layout."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # audio_format = 1 (uncompressed PCM)
        1,  # channels
        sample_rate,
        sample_rate * 2,  # byte rate (mono int16)
        2,  # block align
        16,  # bits per sample
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff_len = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (int16 mono samples, sample_rate).  PCM16 only —
    compressed WAV encodings raise like any other compressed codec."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, samples = 12, None, None
    while i + 8 <= len(data):
        cid, clen = struct.unpack("<4sI", data[i : i + 8])
        body = data[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            audio_format, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_format != 1 or bits != 16 or channels != 1:
                raise NotImplementedError(
                    "only uncompressed PCM16 mono WAV supported"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


# ---------------------------------------------------------------------------
# Dispatch

# Everything a corrupt-but-sniffable payload can raise out of the codecs:
# bad magic / truncated raster / missing chunks (ValueError), unsupported
# encodings (NotImplementedError), short struct reads on truncated WAV
# chunk headers (struct.error), header scans running off the end
# (IndexError).  Decode KERNELS catch this tuple and skip-and-drop the
# row — at corpus scale a single corrupt payload must never kill the job
# (the same discipline as the zero-vector / junk-JSON guards); production
# pipelines route the skipped rows to a quarantine sink.
DECODE_ERRORS = (ValueError, NotImplementedError, IndexError, struct.error)


def sniff(data: bytes) -> str:
    """Container detection by magic bytes."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_media(payload: bytes, media_type: str):
    """Decode an opaque binary payload.

    Returns ``("image", (h, w, 3) uint8)`` for PPM, ``("audio", (samples,
    rate))`` for PCM WAV.  Anything else (JPEG, H.264, MP3, …) needs codec
    libraries not present in this container — swap this fallthrough for
    the real codec call in production."""
    kind = sniff(payload)
    if kind == "ppm":
        return "image", decode_ppm(payload)
    if kind == "wav":
        return "audio", decode_wav(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r} payload (magic={payload[:4]!r}); "
        "compressed formats require codec libraries absent in this environment"
    )
