"""Distributed exclusive prefix-sum: parallel result == single-window truth,
including through the recursive multi-level path."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs2cass_spark.operators import prefixsum


def _truth(df):
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn("o", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint"))


def test_exclusive_cumsum_matches_single_window(spark):
    df = spark.range(5000).select("id", (F.col("id") % 7 + 1).alias("v"))
    got = prefixsum.exclusive_cumsum(df, "id", "v", out="o", shard_width=16)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in _truth(df).collect()
    )
    assert set(got.columns) == {"id", "v", "o"}  # temps dropped


def test_exclusive_cumsum_recursion_levels(spark, monkeypatch):
    """Force the recursive path: LEVEL_LIMIT 10 with 313 level-1 shards
    requires a coarser level before the single-window base case."""
    monkeypatch.setattr(prefixsum, "LEVEL_LIMIT", 10)
    df = spark.range(5000).select("id", (F.col("id") * 13 % 11 + 1).alias("v"))
    got = prefixsum.exclusive_cumsum(df, "id", "v", out="o", shard_width=16)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in _truth(df).collect()
    )


def test_exclusive_cumsum_sparse_keys(spark):
    """Key gaps (filtered corpus) must not disturb offsets — shards are
    id-ranges, not dense ranks."""
    df = (
        spark.range(3000)
        .filter((F.col("id") % 3 != 0) & (F.col("id") % 617 != 1))
        .select("id", (F.col("id") % 5 + 2).alias("v"))
    )
    got = prefixsum.exclusive_cumsum(df, "id", "v", out="o", shard_width=16)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in _truth(df).collect()
    )
