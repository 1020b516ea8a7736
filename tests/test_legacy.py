"""Legacy parser tests (P3) — golden + malformed cases mirroring
/root/reference/src/test/java/com/spotify/hdfs2cass/LegacyInputFormatTest.java:26-85."""

import pytest
from pyspark.sql import Row

from hdfs2cass_spark.operators.legacy import format_legacy_lines, parse_legacy_lines

NOW_MS = 42

GOOD = [
    "HdfsToCassandra\t1\tk1\tc1\tv1",
    "HdfsToCassandra\t2\tk2\tc2\t1000\tv2",
    "HdfsToCassandra\t3\tk3\tc3\t2000\t300\tv3",
]

MALFORMED = [
    "WrongPrefix\t1\tk\tc\tv",          # wrong prefix (:72-73)
    "HdfsToCassandra\t1\tk\tc",         # wrong field count v1 (:77-79)
    "HdfsToCassandra\t2\tk\tc\tv",      # wrong field count v2
    "HdfsToCassandra\t3\tk\tc\t1\tv",   # wrong field count v3
    "HdfsToCassandra\t9\tk\tc\tv",      # unknown version (:97-98)
    "HdfsToCassandra\t2\tk\tc\tNaN\tv",  # non-numeric timestamp (:123-129)
]


def _lines_df(spark, lines):
    return spark.createDataFrame([Row(line=ln) for ln in lines])


def test_parse_all_versions(spark):
    out = parse_legacy_lines(_lines_df(spark, GOOD), now_ms=NOW_MS)
    rows = {r["key"]: r for r in out.collect()}
    assert rows["k1"]["colname"] == "c1"
    assert rows["k1"]["timestamp"] == NOW_MS  # v1: stamped with fixed now
    assert rows["k1"]["ttl"] == 0
    assert rows["k1"]["value"] == "v1"
    assert rows["k2"]["timestamp"] == 1000
    assert rows["k3"]["timestamp"] == 2000
    assert rows["k3"]["ttl"] == 300
    assert rows["k3"]["value"] == "v3"


def test_permissive_drops_malformed(spark):
    out = parse_legacy_lines(_lines_df(spark, GOOD + MALFORMED), mode="permissive", now_ms=NOW_MS)
    assert out.count() == len(GOOD)


@pytest.mark.parametrize("bad", MALFORMED)
def test_strict_raises_per_case(spark, bad):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    out = parse_legacy_lines(_lines_df(spark, [bad]), mode="strict", now_ms=NOW_MS)
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        out.collect()


def test_strict_passes_good(spark):
    out = parse_legacy_lines(_lines_df(spark, GOOD), mode="strict", now_ms=NOW_MS)
    assert out.count() == 3


def test_roundtrip_format_parse(spark):
    df = spark.createDataFrame([Row(k="a", c="col", ts=123, ttl=5, v="val")])
    lines = format_legacy_lines(df, key="k", colname="c", value="v", timestamp="ts", ttl="ttl")
    assert lines.collect()[0]["line"] == "HdfsToCassandra\t3\ta\tcol\t123\t5\tval"
    back = parse_legacy_lines(lines, mode="strict").collect()[0]
    assert (back["key"], back["colname"], back["timestamp"], back["ttl"], back["value"]) == (
        "a", "col", 123, 5, "val",
    )
