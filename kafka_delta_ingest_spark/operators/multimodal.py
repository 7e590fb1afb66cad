"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (the runtime has no
image/audio libraries): ``decode=...`` accepts a user kernel, and the
default ``deterministic_fake_features`` derives stable pseudo-features
from a hash of the bytes so the full Spark plumbing — schema,
partition-preserving mapInPandas, Arrow batch shapes, metadata structs —
is real and testable. Swap the kernel for PIL/ffmpeg on a real cluster.

Scale design: media bytes never leave their partition; feature
extraction is a narrow ``mapInPandas`` (no shuffle), and downstream
joins use the compact (id, features) projection, not the blobs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def real_decode_stub(_bytes: bytes) -> list[float]:
    """Placeholder for a real decoder (PIL.Image.open / librosa / ffmpeg).

    Kept as an explicit NotImplementedError so the seam where a real
    kernel plugs in is obvious and typed.
    """
    raise NotImplementedError(
        "media decoding requires an image/audio library; "
        "pass decode=your_kernel to extract_features"
    )


def deterministic_fake_features(b: bytes) -> list[float]:
    """Stable pseudo-features from the byte content (no media libs)."""
    import hashlib

    h = hashlib.sha256(b or b"").digest()
    return [b0 / 255.0 for b0 in h[:FEATURE_DIM]]


def extract_features(
    df: DataFrame,
    decode: Callable[[bytes], list[float]] = deterministic_fake_features,
    media_col: str = "media",
    id_col: str = "media_id",
    batch_hint: int = 256,
) -> DataFrame:
    """(media_id, n_bytes, features[FEATURE_DIM]) via mapInPandas.

    Narrow transformation: no shuffle, Arrow-batched, one Python worker
    hop per partition. ``batch_hint`` documents the intended Arrow batch
    row count (set spark.sql.execution.arrow.maxRecordsPerBatch).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            ids = pdf[id_col]
            feats, sizes = [], []
            for b in media:
                raw = bytes(b) if b is not None else b""
                sizes.append(len(raw))
                feats.append(decode(raw))
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": sizes, "features": feats}
            )

    from kafka_delta_ingest_spark.operators.util import spread

    return spread(df).mapInPandas(run, schema=FEATURES_SCHEMA)


def deterministic_fake_resize(b: bytes, width: int, height: int) -> bytes:
    """Stubbed resize kernel: deterministic byte reshaping standing in
    for PIL ``Image.resize`` (no image libs in this runtime). The output
    length is ``width*height`` bytes sampled evenly from the input, so
    batch shapes and size accounting downstream are realistic."""
    target = max(1, width * height)
    src = b or b"\x00"
    step = max(1, len(src) // target)
    return bytes(src[i] for i in range(0, min(len(src), step * target), step))[:target]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    kernel: Callable[[bytes, int, int], bytes] = deterministic_fake_resize,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize media blobs via Arrow-batched ``mapInPandas``.

    Real plumbing, stubbed kernel (swap in PIL/ffmpeg on a cluster):
    output keeps the media schema with updated width/height metadata.
    Narrow transformation — blobs never cross a shuffle boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_media = [
                kernel(bytes(b) if b is not None else b"", width, height)
                for b in pdf[media_col]
            ]
            meta = [
                {
                    "format": (m or {}).get("format"),
                    "width": width,
                    "height": height,
                    "duration_ms": (m or {}).get("duration_ms"),
                }
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "media": out_media, "meta": meta}
            )

    from kafka_delta_ingest_spark.operators.util import spread

    return spread(df).mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Explode a video row into per-frame work items (no decode).

    Produces (media_id, frame_idx, ts_ms) from meta.duration_ms — the
    shuffle-free planning step a distributed frame extractor fans out
    from; the decode itself is the stubbed kernel above.
    """
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).select(
        id_col,
        "frame_idx",
        (F.col("frame_idx") * every_ms).cast("long").alias("ts_ms"),
    )


def media_from_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test fixture builder: wrap document text bytes as fake media rows."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").cast("binary").alias("media"),
        F.struct(
            F.lit("fake/text").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.length(text_col) * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
