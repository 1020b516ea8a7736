"""Tests: skew-salting utilities and sink-boundary wire encoding."""

import struct

from pyspark.sql import Row
from pyspark.sql import functions as F

from hdfs2cass_spark.functions.murmur3 import cassandra_token
from hdfs2cass_spark.functions.serde import to_cassandra_bytes
from hdfs2cass_spark.operators.skew import salted_count, salted_join
from hdfs2cass_spark.sinks.pipeline import bulk_load
from hdfs2cass_spark.sinks.wire import encode_cql_wire


def test_capped_buckets_equals_naive_form(spark):
    """Semantic differential for the hot-key-safe bucket gate: on a corpus
    mixing singletons, in-range buckets, boundary-size buckets (exactly 2 and
    exactly cap), and one hot key far over the cap, capped_buckets must
    return exactly what the naive groupBy+collect_list+size-filter returns —
    the rewrite only changes WHERE the size gate runs, never the result."""
    import random

    from hdfs2cass_spark.operators.buckets import capped_buckets

    cap = 7
    rng = random.Random(303)
    rows, next_id = [], 0

    def bucket(key, n):
        nonlocal next_id
        for _ in range(n):
            rows.append((key, next_id))
            next_id += 1

    for k in range(40):
        bucket(f"k{k}", rng.choice([1, 1, 2, 3, cap - 1, cap, cap + 1]))
    bucket("hot", 500)  # the adversarial key the gate exists for
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k string, v long").repartition(8)

    got = {
        r["k"]: r["ids"]
        for r in capped_buckets(df, ["k"], "v", cap=cap).collect()
    }
    naive = {
        r["k"]: r["ids"]
        for r in df.groupBy("k")
        .agg(F.sort_array(F.collect_list("v")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= cap))
        .collect()
    }
    assert got == naive
    assert "hot" not in got and all(2 <= len(v) <= cap for v in got.values())


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k"), "o_orderkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    plain = sorted(tuple(r) for r in o.join(c, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(o, c, ["k"], n=4).collect())
    assert plain == salted


def test_salted_count_equals_plain(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = {r["event_type"]: r["n"] for r in
             e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["event_type"]: r["n_rows"] for r in salted_count(e, "event_type", n=4).collect()}
    assert plain == salted


def test_wire_encoding_matches_serde(spark):
    df = spark.createDataFrame(
        [Row(user_id="u1", plays=7, score=1.5), Row(user_id="u2", plays=None, score=None)]
    )
    routed = bulk_load(df, "cql://h/ks/t?reducers=2", rowkey="user_id", now_ms=42)
    wire = {r["pk"]: r for r in encode_cql_wire(routed).collect()}

    r1 = wire[b"u1"]
    assert r1["token"] == cassandra_token(b"u1")
    # values = [user_id, plays, score, writetime, ttl] in column order
    assert r1["values"][0] == b"u1"
    assert r1["values"][1] == struct.pack(">q", 7)  # LongType column -> 8-byte encoding
    assert r1["values"][2] == struct.pack(">d", 1.5)
    assert r1["values"][-2] == struct.pack(">q", 42000)  # µs writetime, always 8 bytes
    assert r1["values"][-1] == struct.pack(">i", 0)  # ttl, always 4 bytes

    r2 = wire[b"u2"]
    assert r2["values"][1] == b""  # null -> empty buffer (CassandraRecordUtils.java:81-82)


def test_thrift_wire_encoding(spark):
    from hdfs2cass_spark.sinks.wire import encode_thrift_wire

    df = spark.createDataFrame(
        [("u1", 7, None)], schema="user_id string, plays int, score double"
    )
    routed = bulk_load(df, "thrift://h/ks/t?reducers=2", rowkey="user_id", now_ms=42)
    out = encode_thrift_wire(routed).collect()[0]
    assert bytes(out["pk"]) == b"u1"
    assert out["token"] == cassandra_token(b"u1")
    muts = {bytes(m["name"]): m for m in out["mutations"]}
    assert set(muts) == {b"plays", b"score"}
    assert bytes(muts[b"plays"]["value"]) == b"7"
    assert bytes(muts[b"score"]["value"]) == b""  # null -> empty
    assert muts[b"plays"]["ts"] == 42  # thrift: ms


def test_wire_encoding_composite_key(spark):
    """Composite-key wire form: pk = the composite envelope bytes (_pk), and
    the internal _pk column must NOT leak into the bind-values array."""
    from hdfs2cass_spark.functions.serde import compose_partition_key

    df = spark.createDataFrame(
        [Row(order_id=7, line_no=2, qty=5)],
        schema="order_id long, line_no int, qty int",
    )
    routed = bulk_load(
        df, "cql://h/ks/t?reducers=2", rowkey=["order_id", "line_no"], now_ms=42
    )
    out = encode_cql_wire(routed).collect()[0]
    import struct as _s
    expected_pk = compose_partition_key(_s.pack(">q", 7), _s.pack(">i", 2))
    assert bytes(out["pk"]) == expected_pk
    assert out["token"] == cassandra_token(expected_pk)
    # values = [order_id, line_no, qty] + [writetime, ttl] — no _pk, no _rowkey
    assert len(out["values"]) == 5
    assert out["values"][0] == struct.pack(">q", 7)
    assert out["values"][1] == struct.pack(">i", 2)
    assert out["values"][2] == struct.pack(">i", 5)


def test_wire_encoding_typed_single_column_key(spark):
    """A bigint single-column rowkey tokenizes over its typed 8-byte encoding,
    not its string form (CassandraRecordUtils.toByteBuffer via getKeyFn)."""
    df = spark.createDataFrame([Row(cust_id=42, name="x")], schema="cust_id long, name string")
    routed = bulk_load(df, "cql://h/ks/t?reducers=2", rowkey="cust_id", now_ms=42)
    out = encode_cql_wire(routed).collect()[0]
    typed = struct.pack(">q", 42)
    assert bytes(out["pk"]) == typed
    assert out["token"] == cassandra_token(typed)
    assert out["token"] != cassandra_token(b"42")  # the old string-form bug


def test_wire_encoding_md5_routed_frame(spark):
    """RandomPartitioner-routed frames carry STRING tokens (39-char decimal —
    128-bit values exceed every JVM numeric); the wire schemas must follow the
    routed dtype instead of pinning LongType, or Arrow rejects the batch.
    Regression for the round-2 advice finding."""
    from hdfs2cass_spark.functions.md5token import md5_token
    from hdfs2cass_spark.operators.partitioning import binary_key_expr, route_to_buckets
    from hdfs2cass_spark.operators.reshape import reshape_cql

    df = spark.createDataFrame(
        [Row(cust_id=42, name="x"), Row(cust_id=7, name="y")],
        schema="cust_id long, name string",
    )
    shaped = reshape_cql(df, rowkey="cust_id", now_ms=42)
    keyed = shaped.withColumn("_pk", binary_key_expr(shaped, ["cust_id"]))
    from hdfs2cass_spark.config import RANDOM

    routed = route_to_buckets(keyed, 2, "_pk", partitioner=RANDOM, shuffle_seed=None)
    out = {bytes(r["pk"]): r for r in encode_cql_wire(routed).collect()}
    typed = struct.pack(">q", 42)
    row = out[typed]
    assert isinstance(row["token"], str) and len(row["token"]) == 39
    assert int(row["token"]) == md5_token(typed)
    # thrift twin composes too
    from hdfs2cass_spark.operators.reshape import reshape_thrift
    from hdfs2cass_spark.sinks.wire import encode_thrift_wire

    tshaped = reshape_thrift(df, rowkey="cust_id", now_ms=42)
    tkeyed = tshaped.withColumn("_pk", F.unbase64(F.base64(F.col("key").cast("binary"))))
    trouted = route_to_buckets(tkeyed, 2, "_pk", partitioner=RANDOM, shuffle_seed=None)
    twire = encode_thrift_wire(trouted).collect()
    assert all(isinstance(r["token"], str) for r in twire)
