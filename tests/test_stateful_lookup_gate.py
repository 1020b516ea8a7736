"""Skip-gated equivalence for the RocksDB point-lookup alternative
(ARCHITECTURE.md "Decision record (round 8)"): whenever the environment
provides the protobuf runtime the transformWithStateInPandas path needs,
a point-lookup keep-first dedup must make decisions IDENTICAL to the
shipping applyInPandasWithState dedup — so flipping the parquet-index
design to a state-store design stays a config change, not a semantic one.
In environments without protobuf (this sandbox) the test records an
explicit skip with the dependency name."""

import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

protobuf = pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas needs the protobuf package "
    "(streaming/stateful.py gate); the parquet-index design is the shipping "
    "default — see ARCHITECTURE.md 'Decision record (round 8)'",
)


def _write_batch(src, name, rows):  # (event_id, ts_ns, user_id, type, value)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([float(r[4]) for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{src}/{name}",
    )


def _point_lookup_dedup_first(events):
    """The RocksDB-backed twin of streaming_dedup_first: ValueState per
    (user_id, event_type) holding the first-seen event id — a true point
    lookup per arriving key instead of a keeper scan."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
    from pyspark.sql.types import LongType, StructField, StructType

    from hdfs2cass_spark.streaming.stateful import _OUT_SCHEMA

    class KeepFirst(StatefulProcessor):
        def init(self, handle):
            self._seen = handle.getValueState(
                "first", StructType([StructField("event_id", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            best = None
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                row = pdf.sort_values(["ts", "event_id"]).iloc[0]
                if best is None or (row["ts"], row["event_id"]) < (
                    best["ts"],
                    best["event_id"],
                ):
                    best = row
            if best is None or self._seen.exists():
                return
            self._seen.update((int(best["event_id"]),))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_type": [key[1]],
                    "event_id": [int(best["event_id"])],
                    "ts_ms": [int(pd.Timestamp(best["ts"]).value // 1_000_000)],
                    "value": [float(best["value"])],
                }
            )

        def close(self):
            pass

    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id", "event_type")
        .transformWithStateInPandas(
            statefulProcessor=KeepFirst(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def _drive(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_point_lookup_dedup_decisions_equal_shipping_path(spark, tmp_path):
    from hdfs2cass_spark.streaming import stream_events
    from hdfs2cass_spark.streaming.stateful import streaming_dedup_first

    src = tmp_path / "gate_src"
    src.mkdir()
    S = 10**9
    base = 1704067200 * S
    _write_batch(
        src, "0.parquet",
        [(1, base + 10 * S, 1, "view", 1.0), (2, base + 20 * S, 1, "view", 2.0),
         (3, base + 30 * S, 2, "click", 3.0)],
    )
    time.sleep(1.1)
    _write_batch(
        src, "1.parquet",
        [(4, base + 40 * S, 1, "view", 4.0),  # cross-batch duplicate: dropped
         (5, base + 50 * S, 2, "view", 5.0)],  # new key: kept
    )

    shipping = sorted(
        tuple(r)
        for r in _drive(
            spark, streaming_dedup_first(stream_events(spark, str(src))), "gate_ship"
        ).collect()
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        lookup = sorted(
            tuple(r)
            for r in _drive(
                spark,
                _point_lookup_dedup_first(stream_events(spark, str(src))),
                "gate_lookup",
            ).collect()
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        shutil.rmtree(src, ignore_errors=True)

    assert len(shipping) == 3  # (1,view,ev1), (2,click,ev3), (2,view,ev5)
    assert lookup == shipping
