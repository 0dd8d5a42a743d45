"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested — schema, Arrow batch shape,
partitioning, UDF signatures; the actual codec calls are STUBBED (the
image/audio libraries are not in this container) behind
``_decode_image_stub``: a deterministic fake that parses our synthetic
header. Swapping in PIL/ffmpeg is a one-function change; nothing in the
pipeline shape moves.

Pattern: mapInPandas over an Arrow batch of (id, media binary, meta struct)
→ per-batch vectorized decode → feature rows. mapInPandas (not a scalar UDF)
because decode output is variable-shape (frames, patches) and may fan out.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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
    StructField("checksum", LongType(), False),
])


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload = 8-byte header (w,h int32 LE)
    + repeating body. Real enough to exercise binary columns end-to-end."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 8) * 16, 16 + (i % 5) * 16
        payload = struct.pack("<ii", w, h) + bytes((i + j) % 256 for j in range(64))
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, payload, w, h, 1000 + i if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decoder — replace with e.g. PIL.Image.open(BytesIO(payload)).
    Parses the synthetic 8-byte header. Raises on short payloads exactly
    like a real codec would on truncated files."""
    if payload is None or len(payload) < 8:
        raise ValueError("truncated media payload")
    w, h = struct.unpack("<ii", payload[:8])
    return w, h


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: batch-vectorized over Arrow batches;
    corrupt payloads become NULL dims instead of failing the task (dead-
    letter style, like the reference errors channel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, checks = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                checks.append(sum(b) % (1 << 31))
                try:
                    w, h = _decode_image_stub(b)
                    ws.append(w)
                    hs.append(h)
                except ValueError:
                    ws.append(None)
                    hs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "decoded_width": pd.array(ws, dtype="Int32"),
                    "decoded_height": pd.array(hs, dtype="Int32"),
                    "checksum": checks,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame sampling plumbing: explode timestamps per clip (the
    decode-at-ts call is the same stub). Columnar fan-out, Python only for
    the stubbed codec."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "width", "height")
    )
