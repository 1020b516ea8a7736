"""Streaming near-duplicate detection: score documents against an
ACCUMULATING minhash signature index as they arrive.

The batch LSH family (plans/llm.py) answers "which pairs in this corpus are
near-dups"; a live ingest pipeline asks a different question per document:
"is this NEW doc a near-dup of anything seen BEFORE it". This module runs
that check per micro-batch via foreachBatch:

  1. the arriving docs' 16-function minhash signatures (the md5-derived
     universal-hash family — identical math to the oracle-checked batch
     queries) are APPENDED to a parquet signature index, denormalized to one
     row per (doc_id, band, bkey, mh[16]) so candidate generation needs ONE
     index scan and no second lookup;
  2. candidates = arriving band keys joined against the index — the arriving
     side is a micro-batch (small by construction), so it BROADCASTS and the
     index is never shuffled; `index.doc_id < arriving.doc_id` keeps only
     matches against earlier arrivals (and makes a replayed batch, whose own
     rows are already in the index, produce exactly the in-batch pairs —
     no separate in-batch code path);
  3. verification is the Broder resemblance estimator — est_jaccard =
     (# equal signature components) / 16 — computed from the signatures
     already riding the join, so NO shingle sets are stored or shipped;
  4. per-doc decisions (is_dup, first_match, best_est, n_earlier_matches)
     land under the sink, one overwritten subdirectory per batch id (the
     same exactly-once-under-replay pattern as stream_decontamination:
     foreachBatch is at-least-once, overwriting the batch's own directory
     makes replays no-ops — for BOTH the index append and the decisions).

Equivalence contract (tests/test_streaming.py): with files arriving in
doc_id order, the streamed decisions are row-identical to
:func:`near_dup_decisions_batch` over the full corpus — including
checkpoint-kill-resume replays.

Deliberate divergence from the batch LSH family's bucket cap, documented:
candidate generation here has NO per-band-key cap, because a cap over an
accumulating index is time-dependent (a key crosses the cap at some batch)
and would break the exact stream==batch twin this module is checked by. The
production policy is to FREEZE a band key once its index df exceeds the cap
(stop generating candidates for it — the capped_buckets policy applied at
index-build time); the join shape is already index-shuffle-free either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.llm import N_HASHES, _band_structs, minhash_wide_df

EST_THRESHOLD = 0.5  # matches >= 8 of 16 signature components


def signature_bands(d: DataFrame) -> DataFrame:
    """(doc_id, band, bkey, mh: array<long>) — the denormalized index rows
    for a (doc_id, text) DataFrame. One row per band per doc; the full
    16-component signature rides every row so candidate joins verify without
    a second lookup."""
    wide = minhash_wide_df(d, spread=False)
    mh = F.array(*[F.col(f"mh{i}") for i in range(N_HASHES)])
    return (
        wide.withColumn("mh", mh)
        .select("doc_id", "mh", F.explode(F.array(*_band_structs())).alias("bb"))
        .select("doc_id", "bb.band", "bb.bkey", "mh")
    )


def _decisions(arriving_ids: DataFrame, cand: DataFrame) -> DataFrame:
    """Fold candidate matches (doc_a = earlier, doc_b = arriving, est) into
    one decision row per arriving doc."""
    agg = cand.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.min("doc_a").alias("first_match"),
        F.max("est").alias("best_est"),
        F.count(F.lit(1)).alias("n_earlier_matches"),
    )
    return (
        arriving_ids.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("first_match").isNotNull().alias("is_dup"),
            "first_match",
            "best_est",
            F.coalesce("n_earlier_matches", F.lit(0)).alias("n_earlier_matches"),
        )
    )


_EST = (
    f"CAST(size(filter(zip_with(a_mh, b_mh, (x, y) -> x = y), v -> v)) AS DOUBLE)"
    f" / {N_HASHES}"
)


def _candidates(index_bands: DataFrame, arriving_bands: DataFrame) -> DataFrame:
    """(doc_a, doc_b, est): earlier index docs sharing a band key with an
    arriving doc, Broder-estimated similarity >= EST_THRESHOLD. The arriving
    side broadcasts; the index is scanned, never shuffled."""
    a = index_bands.select(
        F.col("doc_id").alias("doc_a"), "band", "bkey", F.col("mh").alias("a_mh")
    )
    b = F.broadcast(
        arriving_bands.select(
            F.col("doc_id").alias("doc_b"), "band", "bkey", F.col("mh").alias("b_mh")
        )
    )
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "a_mh", "b_mh")
        .distinct()  # a pair can collide in several bands
        .select("doc_a", "doc_b", F.expr(_EST).alias("est"))
        .filter(F.col("est") >= EST_THRESHOLD)
    )


def near_dup_decisions_batch(d: DataFrame) -> DataFrame:
    """The batch twin: for every doc, is it a near-dup (est_jaccard >=
    threshold) of any EARLIER doc (lower doc_id = earlier arrival). Same
    signatures, same band keys, same estimator as the stream."""
    bands = signature_bands(d)
    cand = _candidates(bands, bands)
    return _decisions(d.select("doc_id"), cand).orderBy("doc_id")


def stream_near_dup(
    stream: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    available_now: bool = False,
):
    """Start the streaming near-dup query; returns the StreamingQuery.

    ``stream`` is a streaming (doc_id, text, ...) DataFrame (see
    decontam.stream_documents). Signatures accumulate under ``index_path``,
    decisions under ``sink_path`` — both batch-id-keyed for replay
    idempotence; read decisions back with :func:`read_decisions`.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        arriving = signature_bands(batch_df.select("doc_id", "text"))
        # 1. index append FIRST (overwrite-own-batch => replay no-op); the
        # subsequent candidate join then sees this batch's rows too, so
        # in-batch pairs come out of the same `doc_a < doc_b` path
        arriving.write.mode("overwrite").parquet(f"{index_path}/batch-{batch_id:09d}")
        index = spark.read.option("recursiveFileLookup", "true").parquet(index_path)
        cand = _candidates(index, arriving)
        _decisions(batch_df.select("doc_id"), cand).write.mode("overwrite").parquet(
            f"{sink_path}/batch-{batch_id:09d}"
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_decisions(spark: SparkSession, sink_path: str) -> DataFrame:
    """Read everything stream_near_dup wrote under ``sink_path``."""
    return spark.read.option("recursiveFileLookup", "true").parquet(sink_path)
