"""Streaming exact-substring scrub: keep-first-occurrence dedup on ingest
— the on-arrival twin of plans/spans.py ``exact_substring_scrub``.

Per arriving micro-batch of documents: hash every SUBSTR_K-word window
(the shared gram table, plans/pipeline.py substring_gram_positions),
enroll each batch's per-gram MIN doc_id into an ACCUMULATING gram index,
and scrub each arriving doc against the index's first-holders — a window
is cut iff its gram was first held by a STRICTLY EARLIER doc_id. The
scrub tail (span merge + map-only index-aware rewrite) is the SHARED
plans/spans.py ``scrub_against_first``, so the two surfaces cannot
drift; with files arriving in doc_id order the streamed rows are
row-identical to the batch query (asserted in tests/test_streaming.py,
across compactions and including in-batch dups — the append-first
read-back makes same-batch earlier docs count).

Index layout (streaming/index.py machinery): ``grams`` (h, first_doc),
compacted with fold = min(first_doc) per h and hash-bucketed on h;
every per-batch read is PRUNED to the arriving batch's gram buckets, so
per-trigger index bytes stay O(arriving grams x rows_per_bucket)
regardless of stream age. Honest cost note: like the batch family (and
Lee et al.'s suffix array), the gram index is linear in corpus WINDOW
count — it is the big index of the streaming family; the fold keeps it
one row per distinct gram, and the ``retain_docs`` horizon (see
stream_scrub) bounds it further by aging out grams whose first-holder
fell behind the ingestion high-water mark — without it a year-old
stream's index grows with the whole corpus.

Replay safety: the enrollment append is a batch-id-keyed overwrite
(at-least-once replays are no-ops) and min-folds are idempotent; the
per-batch scrub output overwrites its own batch directory in the sink.

Reference framing: no streaming or dedup surface exists in the reference
(SURVEY.md §1.4) — extension surface composing the oracle-checked batch
fragments (gram table: exact_substring_spans family; scrub tail:
exact_substring_scrub, oracle row 84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ckpt import release_checkpoint
from ..plans.pipeline import substring_gram_positions
from ..plans.spans import scrub_against_first


def stream_scrub(
    stream: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    available_now: bool = False,
    compact_every: int | None = 16,
    rows_per_bucket: int | None = None,
    retain_docs: int | None = None,
):
    """Start the streaming scrub query; returns the StreamingQuery.
    Scrubbed rows (doc_id, n_words, n_scrubbed, scrubbed_fp — the batch
    query's exact shape) land batch-id-keyed under ``sink_path``; read
    back with :func:`read_scrubbed`.

    ``retain_docs`` bounds the gram index's otherwise-unbounded growth
    (module docstring: the index is linear in corpus windows forever): a
    gram whose retained first-holder is more than ``retain_docs`` doc_ids
    older than the newest arriving doc AGES OUT — dropped at compaction
    and filtered at every per-batch read, so the two surfaces agree
    between compactions. Semantics on the retained set are unchanged: a
    window is cut iff a STRICTLY EARLIER retained holder exists; when an
    aged-out gram reappears, the re-arriving doc becomes its NEW first
    holder (kept intact, later dups scrub against it). The horizon is in
    doc_id units, so it assumes the ingestion key is monotone-ish (the
    in-order contract the stream==batch test already relies on); retention
    granularity is the batch — within one append a gram is represented by
    its min holder, so holders above the min in the SAME batch do not
    extend the gram's retained lifetime. None (default) = retain forever
    (the exact batch-twin behavior)."""
    from .index import ROWS_PER_BUCKET, append, batch_dir, compact, read_index

    rpb = ROWS_PER_BUCKET if rows_per_bucket is None else rows_per_bucket

    def fold_grams(df: DataFrame) -> DataFrame:
        if retain_docs is not None:
            # age-out at compaction: the newest enrolled first-holder is the
            # index's own high-water mark (one scalar agg per compaction —
            # every ~compact_every triggers, not per batch)
            hi = df.agg(F.max("first_doc")).first()[0]
            if hi is not None:
                df = df.filter(F.col("first_doc") >= hi - retain_docs)
        return df.groupBy("h").agg(F.min("first_doc").alias("first_doc"))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grams_p = f"{index_path}/grams"
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact(
                spark,
                grams_p,
                batch_id,
                fold=fold_grams,
                bucket_cols=["h"],
                rows_per_bucket=rpb,
            )
            compact(spark, sink_path, batch_id)
        n = spark.sparkContext.defaultParallelism
        d = batch_df.select("doc_id", "text").repartition(n, "doc_id")
        pos = substring_gram_positions(d)
        # append FIRST, then read the arriving grams BACK from the appended
        # files (the embdup pattern): in-batch earlier docs count as first
        # holders through the same read path, and a replay is a no-op
        append(
            pos.groupBy("h").agg(F.min("doc_id").alias("first_doc")),
            grams_p,
            batch_id,
        )
        agrams = spark.read.parquet(batch_dir(grams_p, batch_id))
        holders = read_index(spark, grams_p, prune=(agrams, ["h"]))
        if retain_docs is not None:
            # read-time twin of the compaction age-out, anchored to the
            # arriving batch's newest doc so uncompacted old appends age
            # out on the same clock (replay-safe: the anchor is a pure
            # function of the batch's own rows)
            hi = batch_df.agg(F.max("doc_id")).first()[0]
            if hi is not None:
                holders = holders.filter(F.col("first_doc") >= hi - retain_docs)
        first = holders.groupBy("h").agg(F.min("first_doc").alias("first_doc"))
        scrub_against_first(d, pos, first).write.mode("overwrite").parquet(
            f"{sink_path}/batch-{batch_id:09d}"
        )
        # pos carries a DISK_ONLY localCheckpoint (substring_gram_positions);
        # in a long-running stream, waiting for GC-driven ContextCleaner lets
        # one checkpoint's blocks accumulate per trigger — free it as soon as
        # the scrub write (its last consumer) has materialized.
        release_checkpoint(pos)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_scrubbed(spark: SparkSession, sink_path: str) -> DataFrame:
    """All scrubbed rows emitted so far (one per arrived doc with >= 1
    word), ordered by doc_id — the batch exact_substring_scrub shape."""
    from .index import read_index

    return read_index(spark, sink_path).orderBy("doc_id")
