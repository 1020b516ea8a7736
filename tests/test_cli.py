"""CLI surface tests (M3)."""

import glob

import pytest

from hdfs2cass_spark.cli import build_parser, main


def test_parser_flags():
    args = build_parser().parse_args(
        [
            "--input", "/a", "--input", "/b",
            "--output", "cql://h/ks/t",
            "--rowkey", "k", "--timestamp", "ts", "--ttl", "ttl",
            "--ignore", "x", "--ignore", "y",
        ]
    )
    assert args.input == ["/a", "/b"]
    assert args.ignore == ["x", "y"]
    assert args.format == "parquet"


def test_required_flags():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--input", "/a"])  # missing --output


def test_cli_end_to_end(spark, sf_dir, tmp_path):
    # spark fixture keeps the session alive; cli's getOrCreate reuses it
    out = str(tmp_path / "sink")
    rc = main(
        [
            "--input", f"{sf_dir}/nation.parquet",
            "--input", f"{sf_dir}/nation.parquet",
            "--rowkey", "n_name",
            "--output", "cql://h/ks/nation?reducers=2",
            "--simulated-path", out,
            "--now-ms", "42",
        ]
    )
    assert rc == 0
    assert len(glob.glob(f"{out}/bucket=*")) >= 1


def test_avro_roundtrip(spark, tmp_path, sf_dir):
    """S1: round-trip a fixture through the Avro container format and
    bulk-load it — identical dataflow to parquet. With spark-avro present
    the native source writes+reads; without it (pip pyspark) the built-in
    pure-Python container reader (sources/avro.py) is the read path and the
    built-in writer produces the fixture — either way the reference's
    primary input format RUNS here, values checked against the parquet
    original."""
    from hdfs2cass_spark.sinks.pipeline import bulk_load
    from hdfs2cass_spark.sources.readers import has_avro_support, read_records

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    avro_dir = tmp_path / "customer_avro"
    if has_avro_support(spark):  # pragma: no cover - jar absent in sandbox
        cust.write.format("avro").save(str(avro_dir))
    else:
        from hdfs2cass_spark.sources.avro import write_avro

        avro_dir.mkdir()
        write_avro(cust, str(avro_dir / "part-0.avro"), codec="deflate")
    back = read_records(spark, str(avro_dir), fmt="avro")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))
    routed = bulk_load(back, "cql://h/ks/t?reducers=4", rowkey="c_custkey", now_ms=42)
    assert routed.count() == cust.count()


def test_avro_builtin_reader_splits_and_codecs(spark, tmp_path):
    """The built-in container reader's scale contract: multi-file input,
    byte-range splits smaller than one file (forced via split_bytes) cover
    every row exactly once, and every supported codec decodes."""
    from hdfs2cass_spark.sources.avro import read_avro, write_avro
    from hdfs2cass_spark.sources import avrodec

    df = spark.range(5000).selectExpr(
        "id",
        "concat('name-', id) AS name",
        "CAST(id AS DOUBLE) / 7 AS score",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE concat('v', id % 5) END AS maybe",
    )
    d = tmp_path / "multi"
    d.mkdir()
    for codec, fname in (("null", "a.avro"), ("deflate", "b.avro"), ("snappy", "c.avro")):
        rows = (r.asDict() for r in df.collect())
        avrodec.write_container(
            str(d / fname),
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "id", "type": "long"},
                    {"name": "name", "type": "string"},
                    {"name": "score", "type": "double"},
                    {"name": "maybe", "type": ["null", "string"]},
                ],
            },
            rows,
            codec=codec,
            block_records=256,
        )
    # 64 KiB splits => many tasks per file; union of 3 files
    back = read_avro(spark, str(d), split_bytes=64 * 1024)
    assert back.count() == 3 * 5000
    one = read_avro(spark, str(d / "b.avro"), split_bytes=64 * 1024)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, df.collect()))


def test_read_records_multi_path_union(spark, sf_dir, tmp_path):
    from hdfs2cass_spark.sources.readers import read_records

    one = read_records(spark, f"{sf_dir}/nation.parquet")
    two = read_records(spark, [f"{sf_dir}/nation.parquet", f"{sf_dir}/nation.parquet"])
    assert two.count() == 2 * one.count()


def test_read_records_csv_json_feed_the_same_pipeline(spark, sf_dir, tmp_path):
    """CSV and JSON inputs (with reader options passed through) run the
    identical reshape -> route dataflow the parquet path runs — a reference
    user's flat files need no staging conversion."""
    from hdfs2cass_spark.sinks.pipeline import bulk_load
    from hdfs2cass_spark.sources.readers import read_records

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    csv_dir, json_dir = str(tmp_path / "c.csv"), str(tmp_path / "c.json")
    cust.write.option("header", "true").csv(csv_dir)
    cust.write.json(json_dir)

    from_csv = read_records(spark, csv_dir, fmt="csv", header="true", inferSchema="true")
    from_json = read_records(spark, json_dir, fmt="json")
    for src in (from_csv, from_json):
        routed = bulk_load(src, "cql://h/ks/t?reducers=4", rowkey="c_custkey", now_ms=42)
        assert routed.count() == cust.count()
        assert {r["bucket"] for r in routed.select("bucket").distinct().collect()} <= set(range(4))


def test_cli_random_partitioner_end_to_end(spark, sf_dir, tmp_path):
    """--partitioner random routes over the MD5/BigIntegerToken ring: tokens
    are 39-digit zero-padded strings, sorted within each bucket, all rows
    kept."""
    import glob

    import pyarrow.parquet as pq

    from hdfs2cass_spark.cli import main

    out = str(tmp_path / "md5out")
    rc = main(
        [
            "--input", f"{sf_dir}/customer.parquet",
            "--rowkey", "c_custkey",
            "--output", "cql://h/ks/customer?reducers=4",
            "--simulated-path", out,
            "--now-ms", "42",
            "--partitioner", "random",
        ]
    )
    assert rc == 0
    total = 0
    dirs = sorted(glob.glob(f"{out}/bucket=*"))
    assert len(dirs) >= 1
    for d in dirs:
        t = pq.read_table(d)
        toks = t.column("token").to_pylist()
        assert toks == sorted(toks)
        assert all(isinstance(x, str) and len(x) == 39 for x in toks)
        total += t.num_rows
    src = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    assert total == src


def test_compressionclass_reaches_the_sink(spark, sf_dir, tmp_path):
    """The compressionclass= URI option maps Cassandra compressor classes to
    the sink codec (M2 fidelity) — verified in the written parquet footers."""
    import glob

    import pyarrow.parquet as pq
    import pytest

    from hdfs2cass_spark.sinks.pipeline import bulk_load

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = str(tmp_path / "gz")
    bulk_load(
        cust,
        "cql://h/ks/t?reducers=2&compressionclass=org.apache.cassandra.io.compress.DeflateCompressor",
        rowkey="c_custkey",
        now_ms=42,
        simulated_path=out,
    )
    f = glob.glob(f"{out}/bucket=*/*.parquet")[0]
    meta = pq.ParquetFile(f).metadata
    assert meta.row_group(0).column(0).compression == "GZIP"

    with pytest.raises(ValueError, match="compressionclass"):
        bulk_load(
            cust,
            "cql://h/ks/t?reducers=2&compressionclass=NoSuchCompressor",
            rowkey="c_custkey",
            now_ms=42,
            simulated_path=str(tmp_path / "bad"),
        )


def test_cli_timestamp_ttl_ignore_flags(spark, sf_dir, tmp_path):
    """M3 flag parity end-to-end: --timestamp/--ttl map those columns into
    writetime (µs) and ttl, --ignore drops the column from the output."""
    import glob

    import pyarrow.parquet as pq

    from hdfs2cass_spark.cli import main

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, "a", 1000, 60), (2, "b", 2000, 0)],
        "rowkey long, payload string, event_ms long, keep_secs int",
    ).write.parquet(src)

    out = str(tmp_path / "out")
    rc = main(
        [
            "--input", src,
            "--rowkey", "rowkey",
            "--timestamp", "event_ms",
            "--ttl", "keep_secs",
            "--ignore", "payload",
            "--output", "cql://h/ks/t?reducers=2",
            "--simulated-path", out,
        ]
    )
    assert rc == 0
    rows = {}
    for d in glob.glob(f"{out}/bucket=*"):
        t = pq.read_table(d)
        for i in range(t.num_rows):
            rows[t.column("_rowkey")[i].as_py()] = {
                c: t.column(c)[i].as_py() for c in t.column_names
            }
    assert set(rows) == {"1", "2"}
    # an explicit --timestamp column binds VERBATIM (the user supplies µs);
    # only the DEFAULT is stamped as currentTimeMillis()*1000 (AvroToCQL.java:63)
    assert rows["1"]["writetime"] == 1000
    assert rows["1"]["ttl"] == 60
    assert rows["2"]["ttl"] == 0
    assert "payload" not in rows["1"]  # --ignore drops the column
    assert "event_ms" not in rows["1"]  # timestamp source column is consumed


def test_avro_timestamp_roundtrip_is_microsecond_exact(spark, tmp_path):
    """The writer's datetime->micros conversion must be integer-exact:
    float total_seconds()*1e6 + int() truncation corrupted ~1.2% of
    timestamps by 1us (review round 11). Includes the adversarial odd-
    microsecond epochs where float64 resolution is ~0.5us."""
    import datetime as dt

    from hdfs2cass_spark.sources.avro import read_avro, write_avro

    rows = [
        (0, dt.datetime(2005, 4, 17, 8, 29, 2, 646319)),  # the fuzz repro
        (1, dt.datetime(1999, 12, 31, 23, 59, 59, 999999)),
        (2, dt.datetime(2070, 1, 1, 0, 0, 0, 1)),
        (3, None),
    ] + [
        (10 + i, dt.datetime(2038, 1, 19, 3, 14, 7, 137 * i % 1000000))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp_ntz")
    p = str(tmp_path / "ts.avro")
    write_avro(df, p)
    got = {r.k: r.ts for r in read_avro(spark, p).collect()}
    for k, want in rows:
        assert got[k] == want, (k, got[k], want)


def test_avro_nested_temporal_stays_underlying_int(spark, tmp_path):
    """A temporal logical type NESTED in a record/array must surface as its
    underlying int/long with the raw value intact — declaring TimestampType
    there while decoding raw millis let pyarrow coerce them as MICROseconds,
    a silent 1000x corruption (review round 11)."""
    from pyspark.sql import types as T

    from hdfs2cass_spark.sources import avrodec
    from hdfs2cass_spark.sources.avro import avro_to_spark_type, read_avro

    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "k", "type": "long"},
            {"name": "t", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {"name": "nest", "type": {"type": "record", "name": "n", "fields": [
                {"name": "t2", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            ]}},
            {"name": "arr", "type": {"type": "array",
                "items": {"type": "long", "logicalType": "timestamp-millis"}}},
        ],
    }
    st = avro_to_spark_type(schema)
    assert isinstance(st["t"].dataType, T.TimestampType)  # top level converts
    assert isinstance(st["nest"].dataType["t2"].dataType, T.LongType)  # nested stays raw
    assert isinstance(st["arr"].dataType.elementType, T.LongType)

    millis = 1700000000000
    p = str(tmp_path / "nested.avro")
    avrodec.write_container(
        p, schema, [{"k": 1, "t": millis, "nest": {"t2": millis}, "arr": [millis]}]
    )
    row = read_avro(spark, p).collect()[0]
    assert row.nest.t2 == millis and row.arr == [millis]
    assert row.t.year == 2023  # top-level converted from millis correctly


def test_avro_fallback_rejects_reader_options(spark, tmp_path):
    import pytest

    from hdfs2cass_spark.sources.readers import has_avro_support, read_records

    if has_avro_support(spark):  # pragma: no cover — jar present elsewhere
        pytest.skip("spark-avro present; fallback gate not applicable")
    with pytest.raises(ValueError, match="built-in Avro fallback"):
        read_records(spark, str(tmp_path / "x.avro"), fmt="avro", avroSchema="{}")


def test_parse_byte_size_spark_forms():
    from hdfs2cass_spark.sources.avro import _DEFAULT_SPLIT, _parse_byte_size

    assert _parse_byte_size("134217728b") == 128 << 20
    assert _parse_byte_size("16m") == 16 << 20
    assert _parse_byte_size("256MB") == 256 << 20
    assert _parse_byte_size("1g") == 1 << 30
    assert _parse_byte_size("4096") == 4096
    assert _parse_byte_size(None) == _DEFAULT_SPLIT
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _parse_byte_size("lots") == _DEFAULT_SPLIT
        assert any("unparseable" in str(x.message) for x in w)
