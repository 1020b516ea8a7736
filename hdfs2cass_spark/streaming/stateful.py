"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windowed aggregations (ingest.py) cover tumbling/session
semantics; this module is the escape hatch for semantics they can't express.
`streaming_dedup_first` is the canonical training-data-pipeline case: exact
streaming dedup — emit the FIRST event per key ever seen on the stream, drop
every later duplicate, across micro-batches.

Scale design (100 TB/day stream):
  - state per key is a single long (the kept event_id) — the smallest possible
    dedup state; Spark shards it by the grouping key across executors.
  - EventTimeTimeout + the watermark evict state for keys idle past the
    retention horizon, so state size tracks the distinct-key churn window,
    not the stream's lifetime.
  - the pandas function is Arrow-batched per key group and self-contained
    (no package globals), so it ships to workers without this package
    installed.

The reference has no streaming surface at all (SURVEY.md §1.4) — this is
extension surface, modeled on the batch `dedup_normalized_keep_first`
(plans/llm.py) whose keep-first semantics it reproduces incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RETENTION_MS = 24 * 3600 * 1000  # evict a key's state 24h (event time) after last sighting

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts_ms", LongType()),
        StructField("value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("first_event_id", LongType())])


def streaming_dedup_first(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Keep the first (ts, event_id)-ordered event per (user_id, event_type)
    key across the whole stream; drop all later duplicates.

    `events` is a streaming DataFrame shaped like streaming.ingest.EVENTS_SCHEMA
    after ts normalization (stream_events). Output mode must be "append".
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def keep_first(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.sort_values(["ts", "event_id"]).iloc[0]
            if best is None or (row["ts"], row["event_id"]) < (best["ts"], best["event_id"]):
                best = row
        if best is None:
            return
        if not state.exists:
            state.update((int(best["event_id"]),))
            # event-time eviction: drop this key's state once the watermark
            # passes now + retention (must be > current watermark or Spark
            # rejects the timestamp)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + RETENTION_MS)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_type": [key[1]],
                    "event_id": [int(best["event_id"])],
                    "ts_ms": [int(pd.Timestamp(best["ts"]).value // 1_000_000)],
                    "value": [float(best["value"])],
                }
            )
        # state.exists: key already emitted earlier in the stream — duplicates

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            keep_first,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
