"""Streaming winnowing-fingerprint matching: flag each arriving document
against an ACCUMULATING fingerprint index — the on-ingest twin of
plans/winnow.py (oracle rows 85-86).

The batch pair query answers "which pairs in this corpus share a passage";
the live-ingest question is per document: "does this NEW doc share >=
MIN_SHARED selected fingerprints with anything seen BEFORE it" (the MOSS
check run at the ingest boundary — catch the plagiarized/boilerplate doc
as it lands, not in a nightly sweep). Per micro-batch, via foreachBatch:

  1. the arriving docs' winnow fingerprints (the SHARED map-only selection,
     plans/winnow.py winnow_fingerprints_df — identical gram + window-min
     arithmetic to the oracle-checked batch queries) are APPENDED to a
     narrow (doc_id, h) index, hash-bucketed on h;
  2. candidates = the arriving fingerprints (bounded by the trigger,
     BROADCAST) joined against the index pruned to the arriving h buckets
     — the ever-growing index is scanned, never shuffled; `doc_a < doc_b`
     keeps matches against earlier arrivals AND makes a replayed batch
     (whose own rows are already in the index) produce exactly the
     in-batch matches — no separate in-batch code path;
  3. per-pair shared-fingerprint counts >= MIN_SHARED fold into one
     decision row per arriving doc (is_matched, first_match, best_shared,
     n_earlier_matches), landing batch-id-keyed under the sink (replay =
     overwrite of the batch's own directory, a no-op).

Equivalence contract (tests/test_streaming.py): with files arriving in
doc_id order the streamed decisions are row-identical to
:func:`winnow_decisions_batch` over the full corpus, across a bucketed
compaction.

Like the near-dup twin, the batch family's bucket cap is NOT applied on
the stream's earlier-match join by default: freezing is time-dependent and
would break the stream==batch contract; the bounded side of every join is
the arriving micro-batch, so the join shape is index-shuffle-free with or
without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.winnow import winnow_fingerprints_df

MIN_SHARED = 2  # fingerprints in common to flag a match (the batch query's bar)


def _decisions(arriving_ids: DataFrame, matched: DataFrame) -> DataFrame:
    """Fold matched pairs (doc_a = earlier, doc_b = arriving, n_shared)
    into one decision row per arriving doc."""
    agg = matched.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.min("doc_a").alias("first_match"),
        F.max("n_shared").alias("best_shared"),
        F.count(F.lit(1)).alias("n_earlier_matches"),
    )
    return arriving_ids.join(agg, "doc_id", "left").select(
        "doc_id",
        F.col("first_match").isNotNull().alias("is_matched"),
        "first_match",
        "best_shared",
        F.coalesce("n_earlier_matches", F.lit(0)).alias("n_earlier_matches"),
    )


def _matched_pairs(
    index_fp: DataFrame, arriving_fp: DataFrame, broadcast_arriving: bool = True
) -> DataFrame:
    """(doc_a, doc_b, n_shared >= MIN_SHARED): earlier docs sharing enough
    fingerprints with an arriving doc. On the streaming path the arriving
    side is one micro-batch — it broadcasts (AQE is off inside foreachBatch;
    the index side is unbounded — the hint is the only shape that never
    moves the index). The batch twin passes ``broadcast_arriving=False``
    because there the "arriving" side IS the full corpus: hinting it would
    broadcast an unbounded table, so the optimizer decides instead."""
    a = index_fp.select(F.col("doc_id").alias("doc_a"), "h")
    b = arriving_fp.select(F.col("doc_id").alias("doc_b"), "h")
    if broadcast_arriving:
        b = F.broadcast(b)
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
    )


def _fingerprint_set(d: DataFrame) -> DataFrame:
    """(doc_id, h) distinct — the narrow index rows (a fingerprint hash can
    be selected at several positions of one doc; matching counts it once)."""
    return winnow_fingerprints_df(d).select("doc_id", "h").distinct()


def winnow_decisions_batch(d: DataFrame) -> DataFrame:
    """The batch twin: for every doc, does it share >= MIN_SHARED winnow
    fingerprints with any EARLIER doc (lower doc_id = earlier arrival).
    Same selection, same counting as the stream. Both join sides here are
    the FULL corpus fingerprint set, so no broadcast hint — the optimizer
    picks the join strategy (shuffle hash at scale)."""
    fp = _fingerprint_set(d)
    matched = _matched_pairs(fp, fp, broadcast_arriving=False)
    return _decisions(d.select("doc_id"), matched).orderBy("doc_id")


def stream_winnow(
    stream: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    available_now: bool = False,
    compact_every: int | None = 16,
    rows_per_bucket: int | None = None,
):
    """Start the streaming winnow-match query; returns the StreamingQuery.
    Decisions land batch-id-keyed under ``sink_path``; read back with
    :func:`read_winnow_decisions`."""
    from .index import ROWS_PER_BUCKET, append, batch_dir, compact, read_index

    rpb = ROWS_PER_BUCKET if rows_per_bucket is None else rows_per_bucket

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fp_p = f"{index_path}/fp"
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact(spark, fp_p, batch_id, bucket_cols=["h"], rows_per_bucket=rpb)
            compact(spark, sink_path, batch_id)
        n = spark.sparkContext.defaultParallelism
        d = batch_df.select("doc_id", "text").repartition(n, "doc_id")
        # append FIRST, read the arriving rows BACK from the appended files
        # (the embdup/neardup pattern): replays are no-ops, in-batch matches
        # ride the same doc_a < doc_b path, and the fingerprint selection
        # runs once, not once per downstream use
        append(_fingerprint_set(d), fp_p, batch_id)
        afp = spark.read.parquet(batch_dir(fp_p, batch_id))
        index = read_index(spark, fp_p, prune=(afp, ["h"]))
        _decisions(
            batch_df.select("doc_id"), _matched_pairs(index, afp)
        ).write.mode("overwrite").parquet(f"{sink_path}/batch-{batch_id:09d}")

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_winnow_decisions(spark: SparkSession, sink_path: str) -> DataFrame:
    """All decisions emitted so far, ordered by doc_id."""
    from .index import read_index

    return read_index(spark, sink_path).orderBy("doc_id")
