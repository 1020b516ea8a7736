"""Distributed exclusive prefix-sum over an ordered key.

The naive Spark formulation — ``sum().over(Window.orderBy(key))`` with no
partition — funnels the ENTIRE input through one task (Spark even warns:
"No Partition Defined for Window operation"). The scalable scheme is the
classic scan decomposition:

  1. group rows into contiguous key-range shards (integer-div of a dense-ish
     ordering key);
  2. exclusive cumsum INSIDE each shard — a partitioned window, fully
     parallel;
  3. per-shard totals form a table 1/width the size of the input; its own
     exclusive cumsum gives each shard's base offset;
  4. join the bases back: offset = base + local (broadcast while the bases
     fit, shuffle hash join on the shard key past BROADCAST_LIMIT rows —
     level-1 bases at extreme scale are too big to broadcast).

Step 3 is itself a prefix-sum, so RECURSE until the level fits comfortably
in one task (LEVEL_LIMIT rows), then use the single window. Each level
shrinks the data by ``width``, so a 1e12-row input needs 3 levels at
width=1e4 — the driver sees one tiny count per level, the data never
funnels. This generalizes pack_sequences' two-level layout to any depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# one task comfortably scans this many pre-aggregated rows
LEVEL_LIMIT = 1_000_000
# bases tables at or below this row count join back as a broadcast (a
# (_shard, _base) row is ~16 bytes + overhead, so this is tens of MB); bigger
# bases fall back to a shuffle hash join on _shard — at 1e12 input rows and
# shard_width=1e4 the level-1 bases hold 1e8 rows, which would OOM the driver
# as a broadcast.
BROADCAST_LIMIT = 1_000_000


def _join_bases(df: DataFrame, bases: DataFrame, on: str, n_bases: int) -> DataFrame:
    # LEFT join, not inner: every shard key trivially has a base (bases is
    # an aggregate of the same rows), but an INNER join makes Catalyst
    # infer an isnotnull(shard) filter into the probe side's scan — and
    # that filter difference breaks the canonical equality ReuseExchange
    # needs to dedup the shared Exchange(hashpartitioning(shard)) subtree
    # (without it the upstream — e.g. pack_sequences' tokenize — scans and
    # shuffles twice per action).
    if n_bases <= BROADCAST_LIMIT:
        bases = F.broadcast(bases)
    return df.join(bases, on, "left")


def exclusive_cumsum(
    df: DataFrame,
    key: str,
    value: str,
    out: str = "_offset",
    shard_width: int = 10_000,
) -> DataFrame:
    """Add column ``out`` = sum of ``value`` over all rows with a smaller
    ``key`` (exclusive running total in key order). ``key`` must be unique
    per row and non-negative; ``value`` is summed as bigint.

    Cost per level: one partitioned window + one aggregate; levels =
    ceil(log_width(rows / LEVEL_LIMIT)) + 1. No unpartitioned window ever
    sees more than LEVEL_LIMIT rows, and no join-back broadcasts more than
    BROADCAST_LIMIT base rows (bigger bases shuffle-join on _shard).
    """
    shard = F.expr(f"{key} div {shard_width}").alias("_shard")
    local_w = (
        Window.partitionBy("_shard")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_local = df.withColumn("_shard", shard).withColumn(
        "_local", F.coalesce(F.sum(value).over(local_w), F.lit(0)).cast("bigint")
    )
    # Shard totals DERIVED FROM THE WINDOW OUTPUT (the key-last row's
    # exclusive cumsum + its own value), NOT a fresh sum(value) aggregate:
    # a plain sum doesn't reference _local, so column pruning deletes the
    # window from the totals subtree and plans a SECOND scan + shuffle of
    # the input — the upstream (e.g. pack_sequences' tokenize) then runs
    # twice per action (measured: 2 FileScans, 0 ReusedExchange). Keeping
    # the dependency makes both join sides share the identical
    # Exchange(hashpartitioning(_shard)) subtree, which ReuseExchange
    # dedups: one scan, one shuffle write. max_by is order-, sign- and
    # NULL-correct where max(_local + value) would need value >= 0.
    totals = with_local.groupBy("_shard").agg(
        F.max_by(F.col("_local") + F.coalesce(F.col(value).cast("bigint"), F.lit(0)), F.col(key))
        .cast("bigint")
        .alias("_tot")
    )
    n = totals.count()  # one scalar per level — levels are logarithmic
    bases = _shard_bases(totals, n)
    return (
        _join_bases(with_local, bases, "_shard", n)
        .withColumn(out, (F.col("_base") + F.col("_local")).cast("bigint"))
        .drop("_shard", "_local", "_base")
    )


def _shard_bases(totals: DataFrame, n: int, width: int = 1024) -> DataFrame:
    """(_shard, _base): exclusive cumsum of _tot in _shard order (``n`` =
    totals row count, supplied by the caller), recursing through coarser
    levels until one task's worth remains."""
    if n <= LEVEL_LIMIT:
        w = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
        return totals.select(
            "_shard",
            F.coalesce(F.sum("_tot").over(w), F.lit(0)).cast("bigint").alias("_base"),
        )
    coarse = F.expr(f"_shard div {width}").alias("_cshard")
    local_w = (
        Window.partitionBy("_cshard")
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_local = totals.withColumn("_cshard", coarse).withColumn(
        "_clocal", F.coalesce(F.sum("_tot").over(local_w), F.lit(0)).cast("bigint")
    )
    ctotals = with_local.groupBy(F.col("_cshard").alias("_shard")).agg(
        F.sum("_tot").cast("bigint").alias("_tot")
    )
    cn = ctotals.count()
    cbases = _shard_bases(ctotals, cn, width).withColumnRenamed("_shard", "_cshard")
    return _join_bases(with_local, cbases, "_cshard", cn).select(
        "_shard",
        (F.col("_base") + F.col("_clocal")).cast("bigint").alias("_base"),
    )
