"""Accumulating parquet indexes for streaming dedup state, with periodic
compaction.

The streaming pipelines (neardup.py, curate.py) append one batch-id-keyed
parquet directory per micro-batch to each index and re-read the index per
batch. Append-only has two costs that grow without bound over a month-long
ingest: (a) every per-batch read lists and opens one directory per PRIOR
batch — a file-listing wall at tens of thousands of batches — and (b) any
derived per-key state (the exact-dedup min-keeper, the band-key document
frequencies) is re-AGGREGATED from raw rows each batch: quadratic total work
over the stream's life.

This module supplies the missing compaction. Every ``compact_every`` batches
the current keeper + all older batch directories FOLD into one
``keeper-<batch_id>`` directory — optionally through a ``fold`` aggregation
(min-per-hash for the exact index, summed counts for the band-frequency
index) — and the folded inputs are deleted. Per-batch cost is then
O(one keeper scan + <= compact_every recent batch dirs) regardless of stream
age, and derived state is aggregated incrementally: folded once at
compaction, per batch only over the bounded recent appends.

Replay safety (foreachBatch is at-least-once): compaction is keyed by the
triggering batch id and idempotent —

  1. the keeper is written FIRST; the folded inputs are deleted only once
     the keeper's ``_SUCCESS`` marker exists. A crash mid-write replays into
     a full rebuild (all sources still present); a crash mid-delete replays
     into "keeper exists -> skip the rebuild, finish the deletes".
  2. only directories with id < the triggering batch id are folded, so a
     replayed batch's own append (id >= trigger) is never folded out from
     under it; committed batch ids are monotone, so no batch older than a
     completed compaction can replay.

Contract boundary, stated honestly: idempotence covers SAME-CHECKPOINT
replays (the only kind Structured Streaming produces). Re-processing a
source from a FRESH checkpoint into an existing index is only a no-op while
the re-appended batch directories still exist — once compaction has folded
them, the replayed rows would duplicate the keeper's. Wiping the checkpoint
therefore requires wiping the indexes (and the sink) with it.

Cost model, stated explicitly: each compaction rewrites the full index
(single-keeper scheme), so amortized compaction I/O is O(index /
compact_every) per batch — the SAME order as the per-batch candidate-join
scan of the index, which is unavoidable (every arrival is judged against
all history). A tiered/leveled LSM scheme would cut the write term to
O(log) but cannot touch the dominating scan term, so the single keeper is
the right complexity-for-simplicity trade here; revisit only if a
deployment's write bandwidth (not scan) becomes the bottleneck.

All filesystem access goes through the Hadoop FileSystem API, so the same
code runs on HDFS/object-store paths, not just local disk.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _parts(spark: SparkSession, path: str) -> tuple[list[int], list[int]]:
    """(keeper ids, batch ids) currently present under ``path``, sorted."""
    fs, hpath, _ = _fs(spark, path)
    keepers: list[int] = []
    batches: list[int] = []
    if not fs.exists(hpath):
        return keepers, batches
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("keeper-"):
            keepers.append(int(name.split("-", 1)[1]))
        elif name.startswith("batch-"):
            batches.append(int(name.split("-", 1)[1]))
    return sorted(keepers), sorted(batches)


def batch_dir(path: str, batch_id: int) -> str:
    return f"{path}/batch-{batch_id:09d}"


def _keeper_dir(path: str, batch_id: int) -> str:
    return f"{path}/keeper-{batch_id:09d}"


def append(df: DataFrame, path: str, batch_id: int) -> None:
    """Write one micro-batch's index rows. Overwriting the batch's OWN
    directory makes an at-least-once replay a no-op."""
    df.write.mode("overwrite").parquet(batch_dir(path, batch_id))


def read_split(
    spark: SparkSession, path: str
) -> tuple[DataFrame | None, DataFrame | None]:
    """(keeper table or None, union of raw batch appends or None).

    Callers that maintain FOLDED per-key state (the exact-dedup min-keeper)
    must use the split view: the keeper is already one row per key and is
    never re-aggregated — only the bounded recent appends are."""
    keepers, batches = _parts(spark, path)
    k = spark.read.parquet(_keeper_dir(path, keepers[-1])) if keepers else None
    b = (
        spark.read.parquet(*[batch_dir(path, i) for i in batches])
        if batches
        else None
    )
    return k, b


def read_index(spark: SparkSession, path: str) -> DataFrame:
    """The whole index (keeper + recent appends) as one DataFrame — for
    consumers whose keeper fold is the identity (bands, signatures)."""
    k, b = read_split(spark, path)
    if k is None and b is None:
        raise FileNotFoundError(f"no index data under {path}")
    if k is None:
        return b
    if b is None:
        return k
    return k.unionByName(b)


def compact(
    spark: SparkSession,
    path: str,
    batch_id: int,
    fold: Callable[[DataFrame], DataFrame] | None = None,
) -> bool:
    """Fold the keeper and every batch directory with id < ``batch_id`` into
    ``keeper-<batch_id>``, then delete the folded inputs. Idempotent under
    same-checkpoint replay (see the module docstring). Returns True iff a
    keeper for this id exists afterwards."""
    fs, hpath, jvm = _fs(spark, path)
    if not fs.exists(hpath):
        return False
    keepers, batches = _parts(spark, path)
    old_keepers = [k for k in keepers if k < batch_id]
    old_batches = [b for b in batches if b < batch_id]
    target = _keeper_dir(path, batch_id)
    done = fs.exists(jvm.org.apache.hadoop.fs.Path(f"{target}/_SUCCESS"))
    if not done:
        # only the LATEST old keeper holds live data (earlier ones can linger
        # solely after a crash mid-delete, and are strict subsets of it)
        srcs = [_keeper_dir(path, k) for k in old_keepers[-1:]] + [
            batch_dir(path, b) for b in old_batches
        ]
        if not srcs:
            return batch_id in keepers
        df = spark.read.parquet(*srcs)
        if fold is not None:
            df = fold(df)
        df.write.mode("overwrite").parquet(target)
    for d in [_keeper_dir(path, k) for k in old_keepers] + [
        batch_dir(path, b) for b in old_batches
    ]:
        fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
    return True


def n_subdirs(spark: SparkSession, path: str) -> int:
    """Total keeper + batch directories under ``path`` — the quantity
    compaction bounds (tests assert it; ops can alert on it)."""
    keepers, batches = _parts(spark, path)
    return len(keepers) + len(batches)
