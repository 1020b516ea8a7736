"""Structured Streaming tests: stream results must equal the batch catalog
query on the same data (availableNow trigger = bounded deterministic run)."""

import shutil

import pytest

from hdfs2cass_spark.plans import CATALOG
from hdfs2cass_spark.streaming.ingest import (
    sessionize_stream,
    stream_events,
    tumbling_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_tumbling_equals_batch(spark, sf_dir, events_dir):
    stream = stream_events(spark, events_dir)
    assert stream.isStreaming
    got = _run_stream(spark, tumbling_counts_stream(stream), "tumbling_test")
    batch = CATALOG["tumbling_window_events"].fn(spark, sf_dir)
    g = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert g == b


def test_sessionize_stream_runs(spark, events_dir):
    stream = stream_events(spark, events_dir)
    got = _run_stream(spark, sessionize_stream(stream), "session_test")
    rows = got.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["session_end_ms"] >= r["session_start_ms"]
        assert r["n_events"] >= 1


def test_stream_bulk_load(spark, events_dir, tmp_path):
    """The reference dataflow fed by a stream: per-micro-batch token-sorted
    bucket files; total rows equal the batch source."""
    import glob

    import pyarrow.parquet as pq

    from hdfs2cass_spark.streaming import stream_bulk_load, stream_events

    stream = stream_events(spark, events_dir)
    q = stream_bulk_load(
        stream,
        "cql://h/ks/events?reducers=4",
        sink_path=str(tmp_path / "sink"),
        checkpoint=str(tmp_path / "ckpt"),
        rowkey="event_id",
        now_ms=42,
        available_now=True,
    )
    q.awaitTermination(120)
    total = 0
    for d in sorted(glob.glob(str(tmp_path / "sink" / "bucket=*"))):
        for f in glob.glob(d + "/*.parquet"):
            toks = pq.read_table(f).column("token").to_pylist()
            assert toks == sorted(toks)  # per-file (per-batch) append order
            total += len(toks)
    src = spark.read.parquet(f"{events_dir}/events.parquet")
    assert total == src.count()
