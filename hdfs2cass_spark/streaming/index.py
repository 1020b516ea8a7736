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
compact_every) per batch. A tiered/leveled LSM scheme would cut that write
term to O(log) but not the scan term, so the single keeper is the right
complexity-for-simplicity trade; revisit only if a deployment's write
bandwidth (not scan) becomes the bottleneck.

THE SCAN TERM (round 7): the per-batch candidate join must SEE all history,
but it does not have to READ all of it. When ``compact`` is given
``bucket_cols`` the keeper is written HASH-BUCKETED on the key —
``_kb = pmod(xxhash64(key), n_buckets)`` as a directory partition column,
rows sorted by key within each bucket file — and the read side
(:func:`read_split` / :func:`read_index` with ``prune=``) filters the
keeper scan to the buckets the ARRIVING batch's keys actually hash into:
partition pruning skips every other bucket file at plan time, so a trigger
whose key set touches a sliver of the index reads a sliver of it. The
bucket count GROWS with the index (``n_buckets = next_pow2(rows /
rows_per_bucket)``, recorded in the keeper directory name), so per-batch
keeper bytes read are bounded by O(arriving_keys x rows_per_bucket) —
independent of stream age — once the index outgrows the trigger size.

Regime math, stated honestly: keys hash uniformly, so a trigger carrying k
distinct keys touches ~n_buckets x (1 - exp(-k / n_buckets)) buckets — the
prune only bites when k < n_buckets (i.e. once the index has outgrown the
trigger by rows_per_bucket; exactly the month-long-ingest regime the scan
term dominates). A trigger touching more than HALF the buckets degrades
gracefully to the full scan — past that point a huge literal IN list
bloats the plan for a sub-2x read saving, so the filter is elided. The
pruning itself is one tiny job per read: distinct pmod values of the
bounded arriving side — at most n_buckets ints — collected to drive a
partition ``IN`` filter.

All filesystem access goes through the Hadoop FileSystem API, so the same
code runs on HDFS/object-store paths, not just local disk.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# bucket-partition column name on disk (never leaves this module: reads drop it)
_KB = "_kb"
# keeper bucket sizing: ~4M rows/bucket keeps bucket files in the 100-300 MB
# band for the narrow index schemas; floor of 8 so even tiny test indexes
# exercise the bucketed layout, ceiling bounds the directory fan-out
ROWS_PER_BUCKET = 4_000_000
MIN_BUCKETS = 8
MAX_BUCKETS = 1 << 16


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


# keeper-relation cache: keeper directories are IMMUTABLE once their
# _SUCCESS marker exists (compaction always writes a NEW directory name and
# deletes old ones), so the DataFrame — and with it the file/partition
# listing, which costs seconds per call against a bucketed keeper's
# thousands of partition dirs — is reused across micro-batches until
# compact() replaces the keeper and invalidates the path. Entries validate
# against the directory's MODIFICATION TIME (one getFileStatus RPC — cheap
# next to the listing it saves): the wipe-indexes-and-restart flow can
# recreate an identically-named keeper in the same driver session, and a
# stale cached listing would point at deleted part files. Entries from a
# stopped session rebuild (the session check); bounded FIFO so a
# long-lived driver can't accumulate stale relations.
_KEEPER_CACHE: dict[str, tuple[DataFrame, int]] = {}
_KEEPER_CACHE_MAX = 64


def _dir_mtime(spark: SparkSession, d: str) -> int:
    fs, hpath, _ = _fs(spark, d)
    return int(fs.getFileStatus(hpath).getModificationTime())


def _keeper_raw_df(spark: SparkSession, d: str) -> DataFrame:
    hit = _KEEPER_CACHE.get(d)
    mtime = _dir_mtime(spark, d)
    if hit is not None:
        df, cached_mtime = hit
        try:
            if (
                cached_mtime == mtime
                and df.sparkSession is spark
                and not df.sparkSession._sc._jsc.sc().isStopped()
            ):
                return df
        except Exception:
            pass
        _KEEPER_CACHE.pop(d, None)
    df = spark.read.parquet(d)
    if len(_KEEPER_CACHE) >= _KEEPER_CACHE_MAX:
        _KEEPER_CACHE.pop(next(iter(_KEEPER_CACHE)))
    _KEEPER_CACHE[d] = (df, mtime)
    return df


def _invalidate_keepers(path: str) -> None:
    for d in [d for d in _KEEPER_CACHE if d.startswith(f"{path}/keeper-")]:
        _KEEPER_CACHE.pop(d, None)


def invalidate_cache(path: str | None = None) -> None:
    """Explicitly drop cached keeper relations — REQUIRED after any
    out-of-band wipe of an index directory. The cache's mtime validation
    has filesystem granularity (1 s on many filesystems): a
    wipe-indexes-and-restart flow that recreates an identically named
    keeper within the same second would otherwise return a stale cached
    relation pointing at deleted part files. ``path=None`` clears
    everything; a path clears that index's keepers only."""
    if path is None:
        _KEEPER_CACHE.clear()
    else:
        _invalidate_keepers(path)


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _list(
    spark: SparkSession, path: str
) -> tuple[list[tuple[int, int | None, str, bool]], list[int]]:
    """ONE directory listing -> (keeper metas sorted by id, batch ids
    sorted). Keeper meta is (batch id, bucket count or None, dir path,
    _SUCCESS marker present); bucketed keepers are named
    ``keeper-<id>-nb<count>``, unbucketed ``keeper-<id>``. One
    fs.listStatus per call plus one exists() per keeper present (normally
    exactly one) — on object stores every LIST is a billed, latency-bearing
    RPC, and the per-batch read path calls this once per index. The marker
    bit is load-bearing: a keeper WITHOUT it is a torn write (crash mid-
    compaction) and must never be treated as authoritative — its sources
    are guaranteed still present (deletes only run after the marker), so
    readers fall back to them."""
    fs, hpath, jvm = _fs(spark, path)
    hdfs_path = jvm.org.apache.hadoop.fs.Path
    metas: list[tuple[int, int | None, str, bool]] = []
    batches: list[int] = []
    if not fs.exists(hpath):
        return metas, batches
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("keeper-"):
            parts = name.split("-")
            nb = int(parts[2][2:]) if len(parts) > 2 else None
            d = f"{path}/{name}"
            complete = bool(fs.exists(hdfs_path(f"{d}/_SUCCESS")))
            metas.append((int(parts[1]), nb, d, complete))
        elif name.startswith("batch-"):
            batches.append(int(name.split("-", 1)[1]))
    metas.sort(key=lambda m: (m[0], -1 if m[1] is None else m[1]))
    return metas, sorted(batches)


def _keeper_meta(
    spark: SparkSession, path: str
) -> list[tuple[int, int | None, str, bool]]:
    """Keeper metas only (see :func:`_list`)."""
    return _list(spark, path)[0]


def _parts(spark: SparkSession, path: str) -> tuple[list[int], list[int]]:
    """(keeper ids, batch ids) currently present under ``path``, sorted."""
    metas, batches = _list(spark, path)
    return [m[0] for m in metas], batches


def batch_dir(path: str, batch_id: int) -> str:
    return f"{path}/batch-{batch_id:09d}"


def _keeper_dir(path: str, batch_id: int, n_buckets: int | None = None) -> str:
    base = f"{path}/keeper-{batch_id:09d}"
    return base if n_buckets is None else f"{base}-nb{n_buckets:05d}"


def _bucket_expr(cols: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_buckets)).cast(
        "int"
    )


def touched_buckets(keys: DataFrame, cols: list[str], n_buckets: int) -> list[int]:
    """The distinct bucket ids ``keys``' key columns hash into — at most
    ``n_buckets`` ints (the distinct runs over pmod VALUES, so the collect is
    bounded by the bucket count no matter how large ``keys`` is)."""
    rows = (
        keys.select(_bucket_expr(cols, n_buckets).alias(_KB)).distinct().collect()
    )
    return sorted(r[_KB] for r in rows)


def _read_keeper(
    spark: SparkSession,
    meta: tuple[int, int | None, str, bool],
    prune: tuple[DataFrame, list[str]] | None = None,
) -> DataFrame:
    """One keeper directory as a DataFrame — pruned to the arriving side's
    buckets when the keeper is bucketed and ``prune=(keys_df, key_cols)`` is
    given. The ``_kb`` partition column never escapes."""
    _, nb, d, _ = meta
    df = _keeper_raw_df(spark, d)
    if nb is None:
        return df
    if prune is not None:
        keys, cols = prune
        touched = touched_buckets(keys, cols, nb)
        # prune only when it skips a meaningful share: a 60k-literal IN list
        # on a 65536-bucket keeper bloats the plan for a <2x read saving —
        # past half the buckets, the full scan is the better plan
        if len(touched) <= nb // 2:
            df = df.filter(F.col(_KB).isin(touched))
    return df.drop(_KB)


def append(df: DataFrame, path: str, batch_id: int) -> None:
    """Write one micro-batch's index rows. Overwriting the batch's OWN
    directory makes an at-least-once replay a no-op."""
    df.write.mode("overwrite").parquet(batch_dir(path, batch_id))


def read_split(
    spark: SparkSession,
    path: str,
    prune: tuple[DataFrame, list[str]] | None = None,
    exclude_batch: int | None = None,
) -> tuple[DataFrame | None, DataFrame | None]:
    """(keeper table or None, union of raw batch appends or None).

    ``exclude_batch`` skips that one batch directory — for a write_batch
    that must see "state as of BEFORE me": on an at-least-once replay the
    crashed attempt's own (possibly torn) dir would otherwise be read back
    as prior state, making the replay diverge from the first attempt.

    Callers that maintain FOLDED per-key state (the exact-dedup min-keeper)
    must use the split view: the keeper is already one row per key and is
    never re-aggregated — only the bounded recent appends are.

    ``prune=(keys_df, key_cols)`` — the arriving batch's key table — prunes
    a BUCKETED keeper's scan to the buckets those keys hash into (module
    docstring). Sound because the bucket is a pure function of the key: a
    keeper row outside the touched buckets cannot equi-join any arriving
    key. Recent appends are bounded (<= compact_every triggers) and are
    never pruned."""
    keepers, batches = _list(spark, path)
    # Only a COMPLETED (_SUCCESS-marked) keeper is authoritative. An
    # external reader (read_funnel_incremental, read_decisions, a monitor)
    # racing a live compaction mid-write — or inspecting a crashed stream
    # before its replay — must never read a torn keeper as the only copy of
    # the folded data; its sources are guaranteed still present (deletes
    # run only after the marker), so fall back to the newest complete
    # keeper and keep batch dirs >= ITS id.
    complete = [m for m in keepers if m[3]]
    # batch dirs with id < the newest COMPLETE keeper's id are ALREADY
    # FOLDED into it — they exist only inside compact()'s write-then-delete
    # window (or after a crash in it). Reading them would double-count
    # every summed fold (fcnt stage counts, cnt freeze dfs) for any reader
    # that races a compaction or inspects a crashed stream's indexes; the
    # keeper is the authoritative copy, so stale batches are simply skipped.
    if complete:
        batches = [b for b in batches if b >= complete[-1][0]]
    if exclude_batch is not None:
        batches = [b for b in batches if b != exclude_batch]
    k = _read_keeper(spark, complete[-1], prune) if complete else None
    b = (
        spark.read.parquet(*[batch_dir(path, i) for i in batches])
        if batches
        else None
    )
    return k, b


def read_index(
    spark: SparkSession,
    path: str,
    prune: tuple[DataFrame, list[str]] | None = None,
    exclude_batch: int | None = None,
) -> DataFrame:
    """The whole index (keeper + recent appends) as one DataFrame — for
    consumers whose keeper fold is the identity (bands, signatures).
    ``prune`` / ``exclude_batch`` as in :func:`read_split`."""
    k, b = read_split(spark, path, prune, exclude_batch)
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
    bucket_cols: list[str] | None = None,
    rows_per_bucket: int = ROWS_PER_BUCKET,
) -> bool:
    """Fold the keeper and every batch directory with id < ``batch_id`` into
    ``keeper-<batch_id>``, then delete the folded inputs. Idempotent under
    same-checkpoint replay (see the module docstring). Returns True iff a
    keeper for this id exists afterwards.

    ``bucket_cols`` writes the keeper HASH-BUCKETED on those columns with a
    bucket count scaled to the folded row count (clamped to
    [MIN_BUCKETS, MAX_BUCKETS], recorded in the directory name so readers
    recompute the same pmod), rows sorted by key within each bucket file —
    the layout :func:`read_split`'s ``prune`` needs to skip untouched
    buckets. The rebuild after a crash-mid-write recomputes the same count
    from the same (still-present) sources, so the target name is replay-
    deterministic; the done-check matches ANY keeper with this id, so a
    crash-mid-delete replay never needs the (possibly gone) sources."""
    fs, hpath, jvm = _fs(spark, path)
    hdfs_path = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(hpath):
        return False
    keepers, batches = _list(spark, path)
    old_keepers = [m for m in keepers if m[0] < batch_id]
    old_batches = [b for b in batches if b < batch_id]
    # done iff a COMPLETED (_SUCCESS-marked) keeper for this id exists; a
    # torn keeper (crash mid-write) forces the rebuild, whatever its name
    this_id = [m for m in keepers if m[0] == batch_id]
    target = next((m[2] for m in this_id if m[3]), None)
    if target is None:
        if not old_keepers and not old_batches:
            return False
        # only the LATEST old COMPLETE keeper holds live data (earlier ones
        # can linger solely after a crash mid-delete, and are strict subsets
        # of it; a torn one — crash mid-write — is partial and its sources
        # are all still present, so it is delete-pass input only); batch
        # dirs below that keeper's id are already folded into it (the
        # read_split invariant) — refolding them would double-count summed
        # folds permanently, so they are inputs to the DELETE pass only
        df: DataFrame | None = None
        old_complete = [m for m in old_keepers if m[3]]
        if old_complete:
            df = _read_keeper(spark, old_complete[-1])
            old_batches_live = [b for b in old_batches if b >= old_complete[-1][0]]
        else:
            old_batches_live = old_batches
        if old_batches_live:
            b = spark.read.parquet(*[batch_dir(path, i) for i in old_batches_live])
            df = b if df is None else df.unionByName(b)
        if df is None:
            # only torn old keepers remain and no batch dirs — impossible
            # under the protocol (a torn write leaves its sources intact),
            # but never write a keeper from nothing: leave the torn dirs
            # for a later compaction that has real sources
            return False
        nb: int | None = None
        if bucket_cols is not None:
            # bucket sizing uses the PRE-fold source count: counting the
            # fold output would execute the whole fold-and-union twice
            # (once for the count, again for the write — 2x the documented
            # compaction I/O). The source count is a plain scan, it is
            # replay-deterministic, and it only OVERESTIMATES fold-output
            # rows, making buckets at most proportionally smaller than the
            # rows_per_bucket target — never oversized.
            n = df.count()
            if n > 0:
                nb = min(
                    MAX_BUCKETS,
                    max(MIN_BUCKETS, _next_pow2(-(-n // rows_per_bucket))),
                )
        if fold is not None:
            df = fold(df)  # folds are group-preserving: rows > 0 stays > 0
        target = _keeper_dir(path, batch_id, nb)
        if nb is None:
            # zero-row folds write UNBUCKETED: partitionBy of an empty frame
            # emits no data files and the keeper would be unreadable
            df.write.mode("overwrite").parquet(target)
        else:
            (
                df.withColumn(_KB, _bucket_expr(bucket_cols, nb))
                .repartition(F.col(_KB))
                .sortWithinPartitions(_KB, *bucket_cols)
                .write.mode("overwrite")
                .partitionBy(_KB)
                .parquet(target)
            )
    # delete folded inputs, plus any torn same-id keeper that is not the
    # completed target (possible only if rows_per_bucket changed mid-crash)
    doomed = (
        [m[2] for m in old_keepers]
        + [batch_dir(path, b) for b in old_batches]
        + [m[2] for m in this_id if m[2] != target]
    )
    for d in doomed:
        fs.delete(hdfs_path(d), True)
    # folded keepers are gone (and a torn-write rebuild may have overwritten
    # the target in place): drop every cached relation under this index
    _invalidate_keepers(path)
    return True


def n_subdirs(spark: SparkSession, path: str) -> int:
    """Total keeper + batch directories under ``path`` — the quantity
    compaction bounds (tests assert it; ops can alert on it)."""
    keepers, batches = _parts(spark, path)
    return len(keepers) + len(batches)
