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


def test_thrift_by_convention(spark):
    from hdfs2cass_spark.operators.reshape import reshape_thrift_by_convention

    df = spark.createDataFrame(
        [Row(rowkey="k1", timestamp=99, ttl=5, song="s")]
    )
    out = reshape_thrift_by_convention(df, now_ms=NOW_MS).collect()[0]
    muts = {m["name"]: m for m in out["mutations"]}
    assert out["key"] == "k1"
    assert set(muts) == {"song"}  # rowkey/timestamp/ttl consumed by convention
    assert muts["song"]["ts"] == 99
    assert muts["song"]["ttl"] == 5

    # missing timestamp/ttl tolerated (ThriftByFieldNamesFn.java:56-77)
    df2 = spark.createDataFrame([Row(rowkey="k2", song="s2")])
    out2 = reshape_thrift_by_convention(df2, now_ms=NOW_MS).collect()[0]
    assert {m["name"] for m in out2["mutations"]} == {"song"}
    assert out2["mutations"][0]["ts"] == NOW_MS

    import pytest as _pytest

    with _pytest.raises(ValueError):
        reshape_thrift_by_convention(spark.createDataFrame([Row(a=1)]))


def test_legacy_to_cql_and_thrift(spark):
    from hdfs2cass_spark.operators.legacy import (
        legacy_to_cql,
        legacy_to_thrift,
        parse_legacy_lines,
    )

    lines = spark.createDataFrame(
        [Row(line="HdfsToCassandra\t3\tk\tcol\t100\t5\tv")]
    )
    parsed = parse_legacy_lines(lines, mode="strict")
    cql = legacy_to_cql(parsed).collect()[0]
    assert (cql["_rowkey"], cql["colname"], cql["value"]) == ("k", "col", "v")
    # the parsed ms value binds VERBATIM (LegacyHdfsToCQL.java:44-49 passes it
    # unchanged into CQLRecord.create) — no ms->µs scaling
    assert cql["writetime"] == 100
    thrift = legacy_to_thrift(parsed).collect()[0]
    assert thrift["mutations"][0]["name"] == "col"
    assert thrift["mutations"][0]["ts"] == 100  # thrift stays ms


def test_thrift_super_columns_end_to_end(spark):
    """W2 SUPER branch (CrunchBulkRecordWriter.java:174-186): each row is one
    Mutation carrying a SuperColumn named by super_col's value with one
    subcolumn per remaining field; wire encoding nests (super, [columns])."""
    from hdfs2cass_spark.operators.partitioning import binary_key_expr, route_to_buckets
    from hdfs2cass_spark.operators.reshape import reshape_thrift_super
    from hdfs2cass_spark.sinks.wire import encode_thrift_super_wire

    df = spark.createDataFrame(
        [
            Row(user="u1", day="2024-01-01", plays=3, skips=1),
            Row(user="u1", day="2024-01-02", plays=5, skips=0),
            Row(user="u2", day="2024-01-01", plays=7, skips=2),
        ]
    )
    shaped = reshape_thrift_super(
        df, rowkey="user", super_col="day", now_ms=NOW_MS, passthrough=[]
    )
    rows = {(r["key"], r["mutations"][0]["super"]): r for r in shaped.collect()}
    m = rows[("u1", "2024-01-02")]["mutations"][0]
    assert [(c["name"], c["value"]) for c in m["columns"]] == [
        ("plays", "5"),
        ("skips", "0"),
    ]
    assert all(c["ts"] == NOW_MS for c in m["columns"])

    keyed = shaped.withColumn("_pk", binary_key_expr(shaped, ["key"]))
    routed = route_to_buckets(keyed, 2, "_pk")
    wire = encode_thrift_super_wire(routed).collect()
    assert len(wire) == 3
    w = {(r["pk"], r["mutations"][0]["super"]): r for r in wire}
    ww = w[(b"u2", b"2024-01-01")]["mutations"][0]
    assert [(c["name"], c["value"]) for c in ww["columns"]] == [
        (b"plays", b"7"),
        (b"skips", b"2"),
    ]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        reshape_thrift_super(df, rowkey="user", super_col="nope")


def test_thrift_counter_columns_end_to_end(spark):
    """W2 COUNTER branch (CrunchBulkRecordWriter.java:188-190): counter
    mutations carry (name, delta) ONLY — no ts/ttl, Cassandra assigns them."""
    from hdfs2cass_spark.operators.partitioning import binary_key_expr, route_to_buckets
    from hdfs2cass_spark.operators.reshape import reshape_thrift_counters
    from hdfs2cass_spark.sinks.wire import encode_thrift_counter_wire

    deltas = spark.createDataFrame(
        [Row(user="u1", plays=3, skips=-1), Row(user="u2", plays=7, skips=0)]
    )
    shaped = reshape_thrift_counters(deltas, rowkey="user")
    row = {r["key"]: r for r in shaped.collect()}
    assert [tuple(m) for m in row["u1"]["mutations"]] == [("plays", 3), ("skips", -1)]
    assert "ts" not in shaped.schema["mutations"].dataType.elementType.fieldNames()

    keyed = shaped.withColumn("_pk", binary_key_expr(shaped, ["key"]))
    routed = route_to_buckets(keyed, 2, "_pk")
    wire = {r["pk"]: r for r in encode_thrift_counter_wire(routed).collect()}
    assert [tuple(m) for m in wire[b"u2"]["mutations"]] == [(b"plays", 7), (b"skips", 0)]


def test_cql_record_from_map_name_to_index_resolution(spark):
    """The library-embedding constructor (CQLRecord.create's name->index
    lookup): input columns in ANY order with extras resolve to the TARGET
    column order exactly; missing target columns fail at plan time with the
    column named."""
    import pytest

    from hdfs2cass_spark.operators.reshape import cql_record_from_map, reshape_cql

    # input deliberately scrambled vs the target order, with an extra column
    df = spark.createDataFrame(
        [Row(plays=3, user="u1", junk="x", added=10), Row(plays=7, user="u2", junk="y", added=20)]
    )
    target = ["user", "added", "plays"]  # the prepared INSERT's column list
    out = cql_record_from_map(df, target, rowkey="user", now_ms=42)
    assert out.columns == ["_rowkey", "user", "added", "plays", "writetime", "ttl"]
    rows = {r["_rowkey"]: r for r in out.collect()}
    assert (rows["u1"]["added"], rows["u1"]["plays"]) == (10, 3)
    assert rows["u1"]["writetime"] == 42_000 and rows["u1"]["ttl"] == 0

    # same shape as reshape_cql on a pre-ordered frame (the two entry points
    # are interchangeable downstream)
    pre = df.select("user", "added", "plays")
    twin = reshape_cql(pre, rowkey="user", now_ms=42)
    assert out.schema == twin.schema
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, twin.collect()))

    with pytest.raises(ValueError, match="missing target columns \\['nope'\\]"):
        cql_record_from_map(df, ["user", "nope"], rowkey="user")
