"""Multimodal column operators: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a `binary` column
(or a pointer into object storage), metadata travels in a typed struct, and
decode/feature-extraction runs as Arrow-batched `mapInPandas` so the Python
decoder sees whole record batches, never row-at-a-time.

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so the decode
body is stubbed: `decode_stub=True` produces deterministic fake features
derived from the payload bytes (shape-true plumbing, testable end-to-end);
`decode_stub=False` raises NotImplementedError where the real codec call goes.
"""

from __future__ import annotations

from collections.abc import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def attach_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Normalize any (id, binary) pair into the media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(F.col(payload_col).cast("binary")).cast("long").alias("byte_len"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Stub features are pure functions of the payload bytes (deterministic,
    engine-independent): fake width/height from the byte length, fake frame
    count, mean byte value as "intensity".
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires an image/audio codec (PIL/ffmpeg); "
                    "not available in this environment"
                )
            payloads = pdf["payload"]
            byte_len = payloads.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": byte_len,
                    "width": (byte_len % 640 + 1).astype("int32"),
                    "height": (byte_len % 480 + 1).astype("int32"),
                    "n_frames": (byte_len // 256 + 1).astype("int32"),
                    "mean_intensity": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Resize transform: binary in -> binary out, metadata updated.

    The 100 TB shape: payload-to-payload transforms stay inside one
    mapInPandas (no decode on the driver, no row-at-a-time Python); the
    output schema carries the new dimensions so downstream operators never
    re-decode to learn them. Stub "resize" deterministically truncates or
    tiles the payload to width*height bytes where the real
    decode->resample->encode goes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires an image codec (PIL); not available "
                    "in this environment"
                )

            def stub_resize(b: bytes) -> bytes:
                if not b:
                    return bytes(target)
                reps = -(-target // len(b))  # ceil-tile then cut
                return (bytes(b) * reps)[:target]

            out = pdf["payload"].map(stub_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "byte_len": out.map(len).astype("int64"),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_len", LongType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_n: int = 2,
    frame_bytes: int = 256,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling: ONE video row -> MANY frame rows (every Nth frame).

    The Spark-side shape that matters at 100 TB: the 1->N amplification
    happens INSIDE mapInPandas (the Arrow batch grows, no driver involvement,
    no explode of a pre-materialized frame array — frames never exist as one
    giant row). Stub "frames" are fixed-size payload slices where the real
    container demuxer goes.
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires a video demuxer (ffmpeg); "
                    "not available in this environment"
                )
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = -(-len(b) // frame_bytes) if b else 0
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_len": pd.Series([len(f) for f in frames], dtype="int64"),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
