"""The histogram-rank NTILE (operators/ntile.py) and its consumers: a
randomized differential against Spark's native ntile() (the ground truth
the operator replaces for scale reasons), window-shape assertions, and RFM
segmentation sanity. Cross-engine equality is the oracle gate's job
(rfm_user_segments / ref_perplexity_buckets hash-match DuckDB NTILE)."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs2cass_spark.operators.ntile import exact_ntile
from hdfs2cass_spark.plans.registry import CATALOG


@pytest.mark.parametrize("seed,n,parts,buckets,desc", [
    (7, 97, 1, 3, True),
    (11, 100, 3, 5, False),
    (23, 8, 2, 5, True),    # n < buckets within parts
    (31, 250, 4, 7, True),  # heavy ties (values drawn from a tiny domain)
])
def test_exact_ntile_equals_native_ntile(spark, seed, n, parts, buckets, desc):
    rng = random.Random(seed)
    rows = [
        (i, f"p{rng.randrange(parts)}", float(rng.randrange(9)))  # tiny domain -> ties
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, p string, v double")
    got = {
        r["id"]: r["bucket"]
        for r in exact_ntile(
            df, buckets, "v", "id", part_cols=["p"], desc=desc
        ).collect()
    }
    key = F.col("v").desc() if desc else F.col("v").asc()
    want = {
        r["id"]: r["w"]
        for r in df.withColumn(
            "w", F.ntile(buckets).over(Window.partitionBy("p").orderBy(key, "id"))
        ).collect()
    }
    assert got == want


def test_exact_ntile_null_partition_buckets_like_native(spark):
    """A NULL partition value must form its own bucket group (NTILE's
    PARTITION BY semantics) instead of vanishing through a never-matching
    equi-join — the null-safe histogram join (review finding)."""
    rows = [(i, None if i < 6 else "p", float(i % 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, p string, v double")
    got = {
        r["id"]: r["bucket"]
        for r in exact_ntile(df, 3, "v", "id", part_cols=["p"]).collect()
    }
    want = {
        r["id"]: r["w"]
        for r in df.withColumn(
            "w",
            F.ntile(3).over(Window.partitionBy("p").orderBy(F.col("v").desc(), "id")),
        ).collect()
    }
    assert len(got) == 12 and got == want


def test_exact_ntile_windows_are_bounded(spark):
    """The whole point: no window partitioned by the ntile partition alone
    may order over row grain — every Window must be histogram-grain
    (partition cols only, over the aggregated histogram) or tie-grain
    (partition cols + the value)."""
    df = spark.range(1000).select(
        F.col("id"), F.lit("x").alias("p"), (F.col("id") % 10).cast("double").alias("v")
    )
    out = exact_ntile(df, 5, "v", "id", part_cols=["p"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the tie-local window partitions by (p, v); the histogram window by (p)
    # but its child is the aggregate — assert no Window consumes the raw
    # relation partitioned by p alone (native ntile's shape)
    assert "ntile" not in plan.lower()
    out.collect()  # and it runs


def test_rfm_segments_sanity(spark, sf_dir):
    rows = CATALOG["rfm_user_segments"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r["segment"] == f"R{r['r_q']}F{r['f_q']}M{r['m_q']}"
        assert 1 <= r["r_q"] <= 5 and 1 <= r["f_q"] <= 5 and 1 <= r["m_q"] <= 5
        assert r["recency_days"] >= 0 and r["frequency"] >= 1
    # quintiles are balanced: sizes differ by at most 1 per dimension
    from collections import Counter

    for col in ("r_q", "f_q", "m_q"):
        sizes = Counter(r[col] for r in rows)
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)
