"""Structured Streaming ingest over the events table.

The reference is strictly batch (SURVEY.md §1.4) — this is the engine's
extension surface: the same event-time aggregations the batch catalog declares
(`tumbling_window_events`, which carries both the tumbling and sliding frames), expressed as a stream
with watermarked late-data handling, plus a stateful sessionization operator.

Design: file-source streams over the fixture parquet with `availableNow`
triggers for tests (bounded, deterministic); on a real cluster the same code
binds to Kafka/file sources unchanged. Watermark bounds state size — without
it a 100 TB/day stream accumulates unbounded window state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hdfs2cass_spark.functions.ts import epoch_millis
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """readStream over a directory of events parquet files (the file source
    monitors a directory; tests point it at a tmp dir seeded with the fixture
    file).

    The file source needs a pinned schema, but the fixture layout has shipped
    `ts` both as INT64 TIMESTAMP(NANOS) (surfaced as ns-longs under
    `nanosAsLong`) and as plain `timestamp[us]` (TIMESTAMP_NTZ). A one-off
    batch read of the already-seeded directory infers which layout this stream
    will see; the ns layout gets the same ns->µs truncation as the batch
    loader so stream and batch agree bit-for-bit.

    Either way the stream's `ts` comes out as TIMESTAMP (LTZ): Spark's
    `withWatermark` rejects TIMESTAMP_NTZ event time, and with the session
    timezone pinned to UTC (ensure_session_confs) the NTZ->LTZ cast is
    value-preserving against the naive-as-UTC oracle."""
    from hdfs2cass_spark.sources.readers import ensure_session_confs

    ensure_session_confs(spark)
    inferred = spark.read.parquet(events_dir).schema["ts"].dataType
    if isinstance(inferred, LongType):
        raw = (
            spark.readStream.schema(_events_schema(LongType()))
            .option("maxFilesPerTrigger", "1")
            .parquet(events_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(_events_schema(inferred))
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch `tumbling_window_events` query: 1h tumbling
    event-time windows with a watermark for late data.

    Output schema matches the batch query exactly (window_start_ms,
    event_type, n_events, total_value) so tests can assert batch == stream.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # 1e-6-quantized int64 accumulation (matches the batch twin's
            # _qsum exactly): order-independent, exact, cheaper than decimal
            (
                F.sum(F.floor(F.col("value") * 1000000).cast("bigint")).cast("double")
                / 1000000.0
            ).alias("total_value"),
        )
        .select(
            epoch_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch sliding frame (tumbling_window_events's
    'sliding' slice): 1h windows
    sliding every 15 min (each event contributes to up to 4 open windows; the
    watermark bounds how many stay in state).

    Output schema matches the batch query exactly (window_start_ms, n_events,
    total_value) so tests can assert batch == stream.
    """
    return (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 1000000).cast("bigint")).cast("double")
                / 1000000.0
            ).alias("total_value"),
        )
        .select(
            epoch_millis(F.col("w.start")).alias("window_start_ms"),
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Stateful sessionization: session windows per user with a gap timeout —
    Spark's built-in session_window keeps per-key state bounded by the
    watermark (the applyInPandasWithState escape hatch is only needed for
    semantics session_window can't express)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
        .select(
            epoch_millis(F.col("w.start")).alias("session_start_ms"),
            epoch_millis(F.col("w.end")).alias("session_end_ms"),
            "user_id",
            "n_events",
            "first_event",
        )
    )
