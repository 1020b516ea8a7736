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


def test_exclusive_cumsum_negative_and_null_values(spark):
    """The shard total is max_by(_local + value, key) (round 12 — it keeps
    the window in the totals subtree so the input is scanned once); that
    form must stay correct for NEGATIVE and NULL values, where a naive
    max(_local + value) would not be."""
    rows = [(0, 5), (1, -7), (2, None), (3, 4), (40, -2), (41, None), (80, 3)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["o"]
        for r in prefixsum.exclusive_cumsum(
            df, "id", "v", out="o", shard_width=32
        ).collect()
    }
    assert got == {0: 0, 1: 5, 2: -2, 3: -2, 40: 2, 41: 0, 80: 0}


def test_exclusive_cumsum_scans_input_once(spark, sf_dir):
    """Regression pin for the round-12 double-scan fix: in the executed
    adaptive plan the totals subtree must REUSE the window's shard
    exchange (one scan + one shuffle write of the input), not re-scan it.
    Requires (a) totals derived from the window output — a plain
    sum(value) gets the window pruned out and plans a second scan — and
    (b) a LEFT join-back — inner infers an isnotnull filter into only one
    side's scan, breaking canonical equality."""
    from hdfs2cass_spark.plans import CATALOG

    df = CATALOG["pack_sequences"].fn(spark, sf_dir)
    df.collect()  # finalize THIS DataFrame's adaptive execution (a noop
    # save would run its own QueryExecution and leave df's un-finalized)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, "totals subtree re-scans the input"
