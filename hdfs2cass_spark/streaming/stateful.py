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
        max_ts_ms = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            max_ts_ms = max(
                max_ts_ms, int(pd.Timestamp(pdf["ts"].max()).value // 1_000_000)
            )
            row = pdf.sort_values(["ts", "event_id"]).iloc[0]
            if best is None or (row["ts"], row["event_id"]) < (best["ts"], best["event_id"]):
                best = row
        if best is None:
            return
        is_new = not state.exists
        if is_new:
            state.update((int(best["event_id"]),))
        # event-time eviction: drop this key's state once the watermark passes
        # now + retention. Set on EVERY batch the key appears in — retention
        # is "after LAST sighting"; extending only on first sight would evict
        # a still-active key and re-emit its next duplicate. Anchored to
        # max(watermark, batch max event time): the watermark is 0 during
        # batch 0, and a 0-anchored timeout lands in 1970 — a key seen only
        # in the first batch would be evicted at the next trigger and its
        # later duplicates re-emitted (round-7 self-review finding).
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), max_ts_ms) + RETENTION_MS
        )
        if is_new:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_type": [key[1]],
                    "event_id": [int(best["event_id"])],
                    "ts_ms": [int(pd.Timestamp(best["ts"]).value // 1_000_000)],
                    "value": [float(best["value"])],
                }
            )
        # else: key already emitted earlier in the stream — duplicates dropped

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


_TOTALS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def streaming_running_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Incrementally maintained per-user totals via transformWithStateInPandas
    (Spark 4's arbitrary-state API, RocksDB-backed): each micro-batch emits
    the UPDATED cumulative (n_events, total_value) for the keys it touched.

    State per key: two longs — the count and a 1e-6-quantized value sum
    (exact int accumulation, same _qsum contract as the batch catalog).
    Requires the RocksDB state store provider (set
    spark.sql.streaming.stateStore.providerClass accordingly) and the
    `protobuf` Python package (the transformWithState runner speaks protobuf
    to the JVM; pip pyspark does not pull it in — this raises with the
    dependency name when absent instead of crashing the streaming runner).
    Output mode "Update".
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' Python package "
            "on driver and executors (pip install protobuf); the streaming "
            "runner crashes opaquely without it"
        ) from e
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle):
            schema = StructType(
                [StructField("n", LongType()), StructField("qsum", LongType())]
            )
            self._state = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                n, qsum = self._state.get()
            else:
                n, qsum = 0, 0
            for pdf in rows:
                vals = pdf["value"].dropna()
                n += len(pdf)
                qsum += int(sum(int(v * 1_000_000 // 1) for v in vals))
            self._state.update((n, qsum))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [qsum / 1_000_000.0],
                }
            )

        def close(self):
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=_TOTALS_OUT,
            outputMode="Update",
            timeMode="EventTime",
        )
    )
