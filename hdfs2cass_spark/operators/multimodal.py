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
