"""Epoch helpers and dual-layout timestamp handling.

The driver has shipped events.ts both as INT64 TIMESTAMP(NANOS) (ns-longs
under nanosAsLong) and as naive timestamp[us] (TIMESTAMP_NTZ in Spark 4).
These tests pin the invariants that survived the flip: epoch_* works on both
NTZ and LTZ columns with identical values, and load_table/stream_events
produce the same timeline from either on-disk layout.
"""

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hdfs2cass_spark.functions.ts import epoch_micros, epoch_millis, epoch_seconds

US = [1704067200_000000, 1704070800_123456, 1704074400_999999]  # 2024-01-01+


def _frames(spark):
    ntz = spark.createDataFrame(
        [(u,) for u in US], "us bigint"
    ).select(F.timestamp_micros("us").cast("timestamp_ntz").alias("ts"))
    ltz = spark.createDataFrame(
        [(u,) for u in US], "us bigint"
    ).select(F.timestamp_micros("us").alias("ts"))
    return ntz, ltz


def test_epoch_helpers_identical_on_ntz_and_ltz(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ntz, ltz = _frames(spark)
    for df in (ntz, ltz):
        rows = df.select(
            epoch_micros("ts").alias("us"),
            epoch_millis("ts").alias("ms"),
            epoch_seconds("ts").alias("s"),
        ).collect()
        assert [r.us for r in rows] == US
        assert [r.ms for r in rows] == [u // 1000 for u in US]
        assert [r.s for r in rows] == [u // 1_000_000 for u in US]


def _write_events(path, ts_array):
    n = len(ts_array)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": ts_array,
                "user_id": pa.array([7] * n, pa.int64()),
                "event_type": pa.array(["click"] * n, pa.string()),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        path,
    )


def test_events_catalog_queries_agree_across_layouts(spark, tmp_path):
    """A full events query (window + epoch emission) must produce identical
    rows whether events.parquet ships ns-longs or us-timestamps — the two
    layouts the driver has generated so far."""
    from hdfs2cass_spark.plans import CATALOG

    import numpy as np

    rng = np.random.default_rng(7)
    us = sorted(
        int(u)
        for u in 1704067200_000000 + rng.integers(0, 86_400_000_000, size=300)
    )
    outs = []
    for name, arr in (
        ("ns", pa.array([u * 1000 for u in us], pa.timestamp("ns"))),
        ("us", pa.array(us, pa.timestamp("us"))),
    ):
        d = tmp_path / name
        d.mkdir()
        _write_events(str(d / "events.parquet"), arr)
        rows = CATALOG["tumbling_window_events"].fn(spark, str(d)).collect()
        outs.append(sorted(tuple(r) for r in rows))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_load_table_same_timeline_from_ns_and_us_layouts(spark, tmp_path):
    from hdfs2cass_spark.sources.readers import load_table

    ns_dir = tmp_path / "ns"
    us_dir = tmp_path / "us"
    ns_dir.mkdir()
    us_dir.mkdir()
    _write_events(
        str(ns_dir / "events.parquet"),
        pa.array([u * 1000 for u in US], pa.timestamp("ns")),
    )
    _write_events(
        str(us_dir / "events.parquet"), pa.array(US, pa.timestamp("us"))
    )
    out = []
    for d in (ns_dir, us_dir):
        e = load_table(spark, str(d), "events")
        out.append(
            [r.us for r in e.select(epoch_micros("ts").alias("us")).orderBy("us").collect()]
        )
    assert out[0] == out[1] == US
