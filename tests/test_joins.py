"""size_guarded_broadcast: the hint must follow measured size, never fiat."""

import pytest

from hdfs2cass_spark.operators.joins import (
    parse_byte_conf,
    plan_size_estimate,
    size_guarded_broadcast,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("10485760", 10485760),
        ("10485760b", 10485760),
        ("10m", 10 << 20),
        ("10MB", 10 << 20),
        ("1g", 1 << 30),
        (" 512k ", 512 << 10),
        (-1, -1),
        ("-1", -1),
    ],
)
def test_parse_byte_conf(raw, expected):
    assert parse_byte_conf(raw) == expected


def _hinted(df):
    # A broadcast() hint shows up as ResolvedHint/UnresolvedHint in the
    # logical plan string before optimization folds it into the join.
    return "hint" in df._jdf.queryExecution().logical().toString().lower()


def test_guard_keeps_hint_when_small(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    assert plan_size_estimate(df) > 0
    assert _hinted(size_guarded_broadcast(df, cap_bytes=1 << 30))


def test_guard_drops_hint_when_large(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = size_guarded_broadcast(df, cap_bytes=16)  # nothing fits in 16 bytes
    assert out is df  # returned unhinted, untouched


def test_guard_disabled_threshold_never_hints(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    assert size_guarded_broadcast(df, cap_bytes=-1) is df


def test_guard_defaults_to_session_threshold(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert size_guarded_broadcast(df) is df
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert _hinted(size_guarded_broadcast(df))  # region is tiny vs 10 MB
