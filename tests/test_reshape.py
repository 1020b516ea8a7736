"""Reshape operator tests (P1/P2/P6) on the songstreams fixture shape
(FIXTURES.md §A1)."""

import pytest
from pyspark.sql import Row

from hdfs2cass_spark.operators.reshape import melt_to_mutations, reshape_cql, reshape_thrift

NOW_MS = 42  # fixed clock, like DateTimeUtils.setCurrentMillisFixed(42) in the reference tests


@pytest.fixture(scope="module")
def songstreams(spark):
    return spark.createDataFrame(
        [
            Row(user_id="u1", timestamp=1000, song_id="s1", junk="x"),
            Row(user_id="u2", timestamp=None, song_id="s2", junk="y"),
        ]
    )


def test_cql_default_rowkey_is_first_field(spark, songstreams):
    out = reshape_cql(songstreams, now_ms=NOW_MS)
    assert out.columns == ["_rowkey", "user_id", "timestamp", "song_id", "junk", "writetime", "ttl"]
    rows = {r["_rowkey"]: r for r in out.collect()}
    assert rows["u1"]["writetime"] == NOW_MS * 1000  # µs
    assert rows["u1"]["ttl"] == 0


def test_cql_rowkey_named_rowkey_convention(spark):
    df = spark.createDataFrame([Row(a=1, rowkey="k")])
    out = reshape_cql(df, now_ms=NOW_MS)
    assert out.collect()[0]["_rowkey"] == "k"


def test_cql_timestamp_ttl_ignore(spark, songstreams):
    out = reshape_cql(
        songstreams, rowkey="user_id", timestamp="timestamp", ignore=["junk"], now_ms=NOW_MS
    )
    # timestamp + ignored fields are consumed, not emitted as values
    assert out.columns == ["_rowkey", "user_id", "song_id", "writetime", "ttl"]
    rows = {r["_rowkey"]: r for r in out.collect()}
    assert rows["u1"]["writetime"] == 1000  # explicit field wins
    assert rows["u2"]["writetime"] == NOW_MS * 1000  # null falls back to now (AvroToCQL.java:73-76)


def test_cql_unknown_column_raises(songstreams):
    with pytest.raises(ValueError):
        reshape_cql(songstreams, rowkey="nope")
    with pytest.raises(ValueError):
        reshape_cql(songstreams, ignore=["nope"])


def test_thrift_mutations(spark, songstreams):
    out = reshape_thrift(songstreams, rowkey="user_id", ignore=["junk"], now_ms=NOW_MS)
    assert out.columns == ["key", "mutations"]
    row = {r["key"]: r for r in out.collect()}["u1"]
    muts = {m["name"]: m for m in row["mutations"]}
    assert set(muts) == {"timestamp", "song_id"}  # rowkey not a mutation
    assert muts["song_id"]["value"] == "s1"
    assert muts["song_id"]["ts"] == NOW_MS  # thrift: MILLIseconds (AvroToThrift.java:69)


def test_melt_matches_thrift_explode(spark, songstreams):
    melted = melt_to_mutations(songstreams, rowkey="user_id", ignore=["junk"], now_ms=NOW_MS)
    got = {(r["key"], r["name"]): r["value"] for r in melted.collect()}
    assert got[("u1", "song_id")] == "s1"
    assert got[("u2", "timestamp")] is None
    assert len(got) == 4
