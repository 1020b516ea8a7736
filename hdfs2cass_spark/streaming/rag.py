"""Streaming RAG retrieval index: the on-ingest twin of the batch
chunk -> embed -> retrieve -> MMR chain (plans/rag.py, plans/mmr.py).

The last batch family without a streaming twin (r8 verdict item 4). Per
arriving micro-batch of documents, foreachBatch chunks and feature-hash
embeds every document with EXACTLY the batch arithmetic (plans/rag.py
chunk_embeddings — the chunk_documents grid + the embed_texts aggregate)
and appends the chunk vectors to an accumulating parquet index
(streaming/index.py machinery: batch-id-keyed appends, periodic bucketed
compaction). Documents in the query set (doc_id < n_queries, a stream
config pinned at query creation — the embdup n_planes precedent) also
append their whole-document embedding to a tiny query-side table.

Retrieval is a READ-time report over the accumulated index
(:func:`rag_report_from_index`), not a per-batch emission — the
rfm_report_from_log / engagement_report_from_days pattern: the stream
maintains state, the report folds it. This buys the strongest twin
contract in the streaming family: retrieval is a pure function of the
accumulated SET of documents, so stream == batch holds for ANY arrival
order (the funnel/neardup twins need in-order arrival; this one does
not), asserted in tests/test_streaming.py with out-of-order batches.

What ingest buys at scale: the chunk+embed cost (the heavy map + the one
map-side-combined aggregate) is paid ONCE per document at arrival;
retrieval reads precomputed vectors. The report's candidate side scans
the full chunk index (exact brute-force cosine — the batch-equal
contract); a production deployment that needs sublinear retrieval routes
the same index through the hyperplane-LSH enrollment of
streaming/embdup.py instead — that family already demonstrates the
code-bucketed candidate path on an accumulating index.

Replay safety: appends are batch-id-keyed overwrites (idempotent under
foreachBatch's at-least-once replay); compaction is the index.py
keeper-first protocol. The index stores VECTORS only — norms are derived
at read time (sqrt/multiply are correctly rounded, so values are
bit-identical to the batch path's embed-time norms).

Reference framing: the reference has no streaming or retrieval surface
(SURVEY.md §1.4) — extension surface composing oracle-checked fragments
(chunk grid: chunk_documents; embedding: text_embed family; cosine/rank:
rag_chunk_retrieval_md5; MMR: rag_mmr_rerank_md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.mmr import _MMR_C  # ONE candidate-pool constant: a local copy
from ..plans.rag import (       # would silently fork the stream==batch
    _DIMS,                      # contract if plans/mmr.py retuned it
    _N_QUERIES,
    _RAG_K,
    chunk_embeddings,
    query_embeddings,
    retrieve_topk,
)


def stream_rag_index(
    stream: DataFrame,
    index_path: str,
    checkpoint: str,
    available_now: bool = False,
    n_queries: int = _N_QUERIES,
    dims: int = _DIMS,
    hash_mode: str = "xxhash64",
    compact_every: int | None = 16,
    rows_per_bucket: int | None = None,
):
    """Start the streaming RAG-index ingest; returns the StreamingQuery.

    Index layout under ``index_path``: ``chunks`` (doc_id, chunk_id,
    cembedding) — compacted hash-bucketed on doc_id; ``qemb`` (q_id, qe) —
    the tiny query-side table. Read back with
    :func:`rag_report_from_index`.

    Enrollment is KEEP-FIRST per doc_id: a doc_id genuinely re-ingested in a
    later batch (not a replay) is anti-joined away against the already-
    enrolled doc_ids, so the index stays a pure function of the accumulated
    doc_id SET and never holds duplicate (doc_id, chunk_id) vectors (which
    would silently corrupt top-k). Consequence: re-ingesting a doc_id with
    DIFFERENT text does NOT update the index — the first-arrived version
    wins; updates need a delete+re-enroll flow this twin does not model.
    The existence probe reads only the arriving docs' hash buckets and
    excludes the current batch dir, so an at-least-once replay sees exactly
    the state the first attempt saw."""
    from .index import ROWS_PER_BUCKET, append, compact, read_index

    rpb = ROWS_PER_BUCKET if rows_per_bucket is None else rows_per_bucket

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        chunks_p, q_p = f"{index_path}/chunks", f"{index_path}/qemb"
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact(
                spark, chunks_p, batch_id,
                bucket_cols=["doc_id"], rows_per_bucket=rpb,
            )
            compact(spark, q_p, batch_id)
        n = spark.sparkContext.defaultParallelism
        d = batch_df.select("doc_id", "text").repartition(n, "doc_id")
        # same-trigger duplicate doc_ids collapse to one arbitrary version
        # (no order exists WITHIN a micro-batch) — rides the repartition's
        # hash partitioning, no extra exchange
        d = d.dropDuplicates(["doc_id"])
        # keep-first: drop arriving docs already enrolled by an EARLIER batch
        # (exclude_batch=batch_id keeps replays identical to first attempts;
        # any doc with >= 1 word has >= 1 chunk, so chunks is the seen-set)
        try:
            seen = (
                read_index(
                    spark,
                    chunks_p,
                    prune=(d.select("doc_id").distinct(), ["doc_id"]),
                    exclude_batch=batch_id,
                )
                .select("doc_id")
                .distinct()
            )
            d = d.join(seen, "doc_id", "left_anti")
        except FileNotFoundError:
            pass  # empty index: every arriving doc is new
        append(
            chunk_embeddings(d, dims=dims, hash_mode=hash_mode),
            chunks_p,
            batch_id,
        )
        append(
            query_embeddings(d, n_queries=n_queries, dims=dims, hash_mode=hash_mode),
            q_p,
            batch_id,
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rag_report_from_index(
    spark: SparkSession,
    index_path: str,
    k: int = _RAG_K,
    mmr: bool = False,
    mmr_c: int = _MMR_C,
    ann: bool = False,
) -> DataFrame:
    """Top-k retrieval (optionally MMR-reranked, lambda = 0.5) over the
    accumulated index — row-identical to the batch rag_retrieve_df /
    mmr_rerank chain on the same document set, regardless of arrival
    order. With ``mmr`` the top-``mmr_c`` candidates per query feed the
    shared greedy reranker (operators/rerank.py). With ``ann`` (mmr=False
    path only) retrieval runs through the hyperplane-LSH candidate path
    (plans/rag.py retrieve_topk_ann, recall >= 0.9 pinned vs exact) instead
    of the exact full scan — the index read is identical, only the
    retrieval tail changes."""
    from .index import read_index

    cemb = read_index(spark, f"{index_path}/chunks")
    qemb = read_index(spark, f"{index_path}/qemb")
    if not mmr:
        if ann:
            from ..plans.rag import retrieve_topk_ann

            return retrieve_topk_ann(cemb, qemb, k=k, n_planes=8, radius=3)
        return retrieve_topk(cemb, qemb, k=k)
    from ..operators.rerank import mmr_rerank

    cands = retrieve_topk(cemb, qemb, k=mmr_c, keep_vectors=True)
    return mmr_rerank(cands, k=k)
