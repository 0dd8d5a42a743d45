"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract — schema, Arrow batch shape, partitioning,
mapInPandas signatures, corrupt→NULL dead-lettering — is the scale-critical
part and is fully real and tested. The codecs:

- image: REAL PNG decode, pure stdlib (zlib inflate + per-row unfilter,
  bit depth 8, greyscale/RGB/RGBA, non-interlaced) — no PIL needed;
- audio: REAL WAV/RIFF PCM decode (16-bit) — no ffmpeg needed;
- video: stubbed behind ``_decode_video_stub`` (no pure-Python codec is
  reasonable; swapping in ffmpeg/PyAV is a one-function change).

The per-row unfilter is an O(width) Python loop per scanline (Sub/Paeth
carry a left-pixel dependency that numpy cannot vectorize); production
swaps `_decode_png` for PIL with zero plan-shape change — mapInPandas
already amortizes per-batch overhead and the decode stays off the JVM.

Pattern: mapInPandas over Arrow batches of (id, media binary, meta struct)
→ per-batch decode → feature rows. mapInPandas (not a scalar UDF) because
decode output is variable-shape (frames, patches) and may fan out.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),  # image | audio | video
    StructField("payload", BinaryType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("decoded_width", IntegerType(), True),
    StructField("decoded_height", IntegerType(), True),
    # image: mean luminance 0-255; audio: RMS amplitude of the PCM samples
    StructField("feature", DoubleType(), True),
    StructField("checksum", LongType(), False),
])

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+A, RGBA


# ---------------------------------------------------------------------------
# PNG (pure stdlib): encode for the synthetic fixture, decode for real
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 rows, one IDAT). ``pixels``: uint8
    array (h, w) greyscale or (h, w, 3) RGB."""
    if pixels.ndim == 2:
        color_type, arr = 0, pixels[:, :, None]
    else:
        color_type, arr = 2, pixels
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Full PNG decode (bit depth 8, color types 0/2/4/6, non-interlaced):
    returns (width, height, uint8 array (h, w, channels)). Raises ValueError
    on anything truncated or unsupported — the caller dead-letters it."""
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,), tag = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype not in _CHANNELS or interlace:
                raise ValueError("unsupported PNG variant")
            ch = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        f = raw[y * (stride + 1)]
        if f == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                row[i] = (row[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter {f}")
        prev = np.frombuffer(bytes(row), dtype=np.uint8)
        out[y] = prev
    return w, h, out.reshape(h, w, ch)


# ---------------------------------------------------------------------------
# WAV (pure stdlib): 16-bit PCM RIFF
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal mono 16-bit PCM WAV writer."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM decode: returns (n_samples, sample_rate, int16 array)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        tag, ln = payload[pos:pos + 4], struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            audio_fmt, _ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV variant")
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data")
    samples = np.frombuffer(data[:len(data) // 2 * 2], dtype="<i2")
    return len(samples), rate, samples


def _decode_video_stub(payload: bytes) -> tuple[int, int]:
    """STUB — no pure-Python video codec is reasonable; replace with
    ffmpeg/PyAV. Parses the synthetic 8-byte (w, h) header; raises on
    truncation exactly like a real demuxer."""
    if payload is None or len(payload) < 8:
        raise ValueError("truncated media payload")
    w, h = struct.unpack("<ii", payload[:8])
    return w, h


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Deterministic media table with REAL payloads: images are valid PNGs
    (greyscale gradient, or RGB every 3rd), audio is valid 16-bit PCM WAV,
    video keeps the synthetic 8-byte header for the stubbed demuxer. Every
    11th payload is truncated mid-file to exercise the dead-letter path."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 8) * 16, 16 + (i % 5) * 16
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            yy, xx = np.mgrid[0:h, 0:w]
            grey = ((xx * 3 + yy * 5 + i) % 256).astype(np.uint8)
            if i % 9 == 0:
                px = np.stack([grey, grey[:, ::-1], np.full_like(grey, i % 256)], axis=2)
            else:
                px = grey
            payload = encode_png(px)
        elif kind == "audio":
            t = np.arange(800 + (i % 7) * 160)
            payload = encode_wav(
                (3000 * np.sin(t * (0.01 + 0.001 * (i % 10)))).astype(np.int16)
            )
        else:
            payload = struct.pack("<ii", w, h) + bytes((i + j) % 256 for j in range(64))
        if i % 11 == 10:  # corrupt: mid-file for codecs, mid-header for video
            payload = payload[:4] if kind == "video" else payload[: max(4, len(payload) // 3)]
        rows.append(
            (i, kind, payload, w, h, 1000 + i if kind != "image" else None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: batch-vectorized over Arrow batches;
    corrupt payloads become NULL dims instead of failing the task (dead-
    letter style, like the reference errors channel). Features: image mean
    luminance (real PNG decode), audio RMS (real WAV decode), video header
    dims (stub)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, feats, checks, sizes = [], [], [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                checks.append(int(zlib.crc32(b)))
                try:
                    if kind == "image":
                        w, h, px = _decode_png(b)
                        feat = float(px[:, :, : min(3, px.shape[2])].mean())
                    elif kind == "audio":
                        n_s, rate, samples = _decode_wav(b)
                        w, h = n_s, rate
                        feat = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                    else:
                        w, h = _decode_video_stub(b)
                        feat = None
                    ws.append(w)
                    hs.append(h)
                    feats.append(feat)
                except ValueError:
                    ws.append(None)
                    hs.append(None)
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "decoded_width": pd.array(ws, dtype="Int32"),
                    "decoded_height": pd.array(hs, dtype="Int32"),
                    "feature": pd.array(feats, dtype="float64"),
                    "checksum": checks,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


THUMB_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("thumb_width", IntegerType(), False),
    StructField("thumb_height", IntegerType(), False),
    StructField("thumb", BinaryType(), False),  # greyscale uint8 row-major
])


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Real thumbnailing over the PNG decode: nearest-neighbor resample to
    (out_w, out_h) greyscale — the downsample is vectorized numpy over the
    decoded array; undecodable images are dropped (dead-letter)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, px = _decode_png(bytes(payload) if payload is not None else b"")
                except ValueError:
                    continue
                grey = px[:, :, : min(3, px.shape[2])].mean(axis=2)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                thumbs.append(grey[np.ix_(yi, xi)].astype(np.uint8).tobytes())
                ids.append(mid)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "thumb_width": out_w,
                    "thumb_height": out_h,
                    "thumb": thumbs,
                }
            )

    return (
        media.filter(F.col("kind") == "image").mapInPandas(run, THUMB_SCHEMA)
    )


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame sampling plumbing: explode timestamps per clip (the
    decode-at-ts call is the stubbed demuxer). Columnar fan-out, Python only
    for the codec."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "width", "height")
    )
