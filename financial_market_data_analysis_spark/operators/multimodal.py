"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The heavy decode libraries (PIL/ffmpeg/torchaudio) are not in this
container, so the decode kernels are STUBS behind ``decoder=`` —
``"fake"`` is a deterministic md5-based feature extractor used by tests
and oracles; ``"real"`` raises ``NotImplementedError`` with the intended
implementation documented. What *is* real and tested here is the
Spark-side plumbing a 100 TB multimodal pipeline needs: the schema
convention, binary-safe Arrow batching, per-partition batch iteration,
and the output contract (fixed-width feature arrays + passthrough
keys).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

N_FAKE_FEATURES = 8


def fake_decode_features(payload: bytes, n: int = N_FAKE_FEATURES) -> list[int]:
    """Deterministic stand-in for decode→embed: feature j = count of odd
    hex digits in md5(payload + b':' + j). Engine-portable (md5), so the
    pipeline is oracle-checkable end to end despite the stubbed codec."""
    out = []
    for j in range(n):
        h = hashlib.md5(payload + b":" + str(j).encode()).hexdigest()
        out.append(sum(1 for ch in h if ch in "13579bdf"))
    return out


def extract_features(
    media: DataFrame,
    decoder: str = "fake",
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = N_FAKE_FEATURES,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` — one Arrow batch of
    binary payloads in, one batch of fixed-width feature rows out. The
    UDF never sees row-at-a-time Python objects; payload bytes stay in
    Arrow buffers until the kernel touches them."""
    if decoder == "real":
        raise NotImplementedError(
            "real decode needs PIL/ffmpeg (not in this image); plug the "
            "codec into the same mapInPandas kernel below"
        )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(IntegerType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        fake_decode_features(bytes(p), n_features)
                        for p in pdf[payload_col]
                    ],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Video → sampled frame rows: one output row per sampled timestamp.
    The sampling grid is pure column math (no decode needed); the frame
    payload extraction is the stubbed part (NULL payload until a real
    codec is plugged in)."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int") + 1
    return (
        media.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
                )
            ).alias("frame_ts_ms"),
        )
        .withColumn("frame_payload", F.lit(None).cast("binary"))
    )


def audio_frames(
    media: DataFrame,
    frame_ms: int = 25,
    hop_ms: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Audio → STFT-style frame grid: one row per (frame_idx, start_ms)
    with the standard ``n = floor((duration - frame) / hop) + 1``
    frame count (clips shorter than one frame yield no rows). The grid
    is pure column math — the sample extraction inside each frame is
    the stubbed codec part, exactly like ``frame_sample`` for video."""
    n_frames = F.expr(f"(duration_ms - {frame_ms}) div {hop_ms}").cast("int") + 1
    return (
        media.filter((F.col("kind") == "audio") & (F.col("duration_ms") >= frame_ms))
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: (i * hop_ms).cast("int"),
                )
            ).alias("frame_idx", "start_ms"),
        )
    )


def resize_geometry(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "media_id",
) -> DataFrame:
    """Aspect-preserving letterbox resize plan for images: output dims
    scaled by min(target_w/w, target_h/h) plus centering pad offsets.
    All-integer math (``div``), so the geometry is bit-identical across
    engines; the pixel resample itself is the stubbed codec step. This
    is the metadata a batched GPU resize kernel consumes."""
    imgs = media.filter(
        (F.col("kind") == "image") & (F.col("width") > 0) & (F.col("height") > 0)
    )
    wide = F.col("width") * target_h >= F.col("height") * target_w
    out_w = F.when(wide, F.lit(target_w)).otherwise(
        F.expr(f"(width * {target_h}) div height").cast("int")
    )
    out_h = F.when(wide, F.expr(f"(height * {target_w}) div width").cast("int")).otherwise(
        F.lit(target_h)
    )
    return imgs.select(
        id_col,
        "width",
        "height",
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        ((F.lit(target_w) - out_w) / 2).cast("int").alias("pad_x"),
        ((F.lit(target_h) - out_h) / 2).cast("int").alias("pad_y"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Test/oracle fixture: treat each document's text bytes as an
    opaque payload with synthesized metadata — same shape a real
    image/audio table would have."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )
