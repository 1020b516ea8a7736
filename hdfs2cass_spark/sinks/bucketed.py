"""Bucketed-table sink: pre-shuffle ONCE at write time, join/aggregate with
ZERO exchanges forever after.

The big-big join (fact x fact, both too large to broadcast) is the one join
shape where `broadcast()` cannot save the shuffle — at 100 TB a repeated
lineitem x orders join re-shuffles both sides on every run. Spark's storage
bucketing amortizes that: `bucketBy(n, key)` hash-partitions rows into a
fixed number of file buckets at WRITE time (the same hashpartitioning a join
exchange would compute), and every later equi-join or aggregation on the
bucket key reads the buckets co-located — the planner drops the Exchange on
both sides (`test_bucketed.py` asserts the joined plan has ZERO exchanges).
`sortBy` additionally pre-sorts within buckets so the sort-merge join's Sort
is file-order, mirroring the token-sorted SSTable contract of the reference
sink (sorted-within-bucket is this engine's house shape).

Operational notes for the 100 TB deployment, encoded here so callers don't
rediscover them:
  - Both sides must bucket on the JOIN key with the SAME bucket count (or
    integer multiples, with `spark.sql.bucketing.coalesceBucketsInJoin`).
  - Bucket count sizes the per-bucket file: target ~100-500 MB per bucket
    per final write task; too few buckets caps join parallelism, too many
    makes small files.
  - One writer task per bucket value avoids the many-small-files explosion:
    repartition on the bucket expression before writing (done here), or the
    writer emits one file per (task, bucket) pair.
  - Bucketed tables require the table catalog (`saveAsTable`); a plain
    `.parquet(path)` write silently drops bucketing. `path` makes the table
    external so the data outlives catalog drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table bucketed (and by default
    sorted) on ``bucket_col``.

    The pre-write ``repartition(num_buckets, bucket_col)`` aligns write tasks
    with buckets: without it every write task emits a file for every bucket
    it sees (tasks x buckets small files).
    """
    w = (
        df.repartition(num_buckets, df[bucket_col])
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucketing metadata (a plain
    ``spark.read.parquet(path)`` would lose it — the catalog carries the
    bucket spec, not the files)."""
    return spark.table(table)
