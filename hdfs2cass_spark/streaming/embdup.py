"""Streaming EMBEDDING-space near-duplicate detection: the semantic twin of
streaming/neardup.py's shingle family, for live ingest.

Per arriving document: feature-hash embed it (operators/embed.py — the
production xxhash64 featurizer), enroll its hyperplane-LSH code(s)
(operators/hyperplane.py planes, optional Hamming-1 multiprobe) against an
ACCUMULATING code index, and verify candidate pairs by EXACT cosine against
the accumulated embedding table — "is this new doc semantically a near-dup
of anything seen before it", per micro-batch via foreachBatch.

Index layout (streaming/index.py machinery end to end, including the
round-7 scale properties):

  - ``codes`` (doc_id, code) — 1 or n_planes+1 narrow rows per doc; keeper
    hash-bucketed on code, per-batch scan PRUNED to the arriving codes'
    buckets;
  - ``emb`` (doc_id, embedding float[dims]) — the wide table; keeper
    bucketed on doc_id and PRUNED to the candidate pairs' doc ids, so the
    vectors ride only candidate-sized reads (the sig-table precedent);
  - ``cnt`` (code, cnt) — opt-in ``code_cap`` freeze counts, folded at
    compaction (a code whose document frequency exceeds the cap stops
    generating candidates: the degenerate-embedding analogue of the band
    freeze — time-dependent, hence outside the exact twin contract).

The LSH plane count is a STREAM CONFIG (pinned at query creation): the
batch family derives p from a corpus count, but a stream's corpus grows
under it and re-deriving would change every enrolled code. Growth is
handled where it binds — the per-code freeze cap — and the chosen p is
recorded by the caller; decisions are exactly
:func:`embed_near_dup_decisions_batch` with the same p (equivalence
tested), which is also the semantics contract: with files arriving in
doc_id order the streamed decisions are row-identical to the batch twin,
including replays (index-append-first, batch-id-keyed overwrites).

Reference framing: the reference has no streaming or similarity surface at
all (SURVEY.md §1.4) — this is extension surface, composing the
oracle-checked batch fragments (embed_texts: text_embed_near_dup_pairs_md5
twin; hyperplane codes: embedding_near_dup_pairs; cosine: the *_topk
family) into the on-ingest shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vec import dot_sql, norm_sql
from ..operators.embed import embed_texts
from ..operators.hyperplane import DEFAULT_SEED, _with_code, lsh_planes
from .neardup import _decisions

THRESHOLD = 0.95  # matches the batch text-embed family (plans/textembed.py)
N_PLANES = 12  # stream default: expected load N/2^p stays modest to ~1M docs/cap


def codes_of(
    emb: DataFrame, n_planes: int, dims: int, multiprobe: int, seed: int = DEFAULT_SEED
) -> DataFrame:
    """(doc_id, code) enrollment rows: the doc's own hyperplane code, plus —
    with multiprobe=1 — the n_planes codes at Hamming distance 1 (pairs
    differing in <= 2 bits still meet; identical enrollment on both the
    index and arriving sides keeps the candidate relation symmetric)."""
    planes = lsh_planes(n_planes, dims, seed)
    coded = _with_code(emb, planes, "doc_id", "embedding").withColumnRenamed(
        "_id", "doc_id"
    )
    if not multiprobe:
        return coded.select("doc_id", "code")
    probes = F.array(
        F.col("code"), *[F.col("code").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)]
    )
    return coded.select("doc_id", F.explode(probes).alias("code"))


def _candidate_pairs(index_codes: DataFrame, arriving_codes: DataFrame) -> DataFrame:
    """(doc_a, doc_b): earlier docs sharing an enrolled code with an arriving
    doc. Arriving side broadcast (bounded by the trigger; AQE is off inside
    foreachBatch) — the unbounded index is scanned, never shuffled."""
    a = index_codes.select(F.col("doc_id").alias("doc_a"), "code")
    b = F.broadcast(arriving_codes.select(F.col("doc_id").alias("doc_b"), "code"))
    return (
        a.join(b, "code")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()  # a pair can collide under several probe codes
    )


def _verify(
    pairs: DataFrame,
    index_emb: DataFrame,
    arriving_emb: DataFrame,
    threshold: float,
) -> DataFrame:
    """(doc_a, doc_b, sim): exact cosine over candidate pairs only. Pairs and
    the arriving vectors broadcast; the index embedding table is scanned
    (pruned by the caller to the pairs' buckets). Norms ride each side once;
    zero-norm vectors yield NULL cosine and are excluded."""
    a = index_emb.select(
        F.col("doc_id").alias("doc_a"),
        F.col("embedding").alias("_va"),
        F.expr(norm_sql("embedding")).alias("_na"),
    ).join(F.broadcast(pairs), "doc_a")
    full = a.join(
        F.broadcast(
            arriving_emb.select(
                F.col("doc_id").alias("doc_b"),
                F.col("embedding").alias("_vb"),
                F.expr(norm_sql("embedding")).alias("_nb"),
            )
        ),
        "doc_b",
    )
    sim = F.expr(dot_sql("_va", "_vb")) / F.expr("nullif(_na * _nb, CAST(0 AS DOUBLE))")
    return (
        full.select("doc_a", "doc_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def embed_near_dup_decisions_batch(
    d: DataFrame,
    threshold: float = THRESHOLD,
    n_planes: int = N_PLANES,
    dims: int = 64,
    multiprobe: int = 1,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """The batch twin: for every doc, is it an embedding-space near-dup
    (cosine >= threshold among LSH candidates) of any EARLIER doc (lower
    doc_id = earlier arrival). Same featurizer, same planes, same
    enrollment, same estimator as the stream. NULL-text docs never embed
    and are never dups."""
    emb = embed_texts(d, dims=dims)
    codes = codes_of(emb, n_planes, dims, multiprobe, seed)
    verified = _verify(_candidate_pairs(codes, codes), emb, emb, threshold)
    return _decisions(d.select("doc_id"), _as_est(verified)).orderBy("doc_id")


def _as_est(verified: DataFrame) -> DataFrame:
    # neardup._decisions folds on an 'est' column; the cosine plays that role
    return verified.select("doc_a", "doc_b", F.col("sim").alias("est"))


def stream_embed_near_dup(
    stream: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    available_now: bool = False,
    threshold: float = THRESHOLD,
    n_planes: int = N_PLANES,
    dims: int = 64,
    multiprobe: int = 1,
    seed: int = DEFAULT_SEED,
    code_cap: int | None = None,
    compact_every: int | None = 16,
    rows_per_bucket: int | None = None,
):
    """Start the streaming embedding near-dup query; returns the
    StreamingQuery. Decisions (doc_id, is_dup, first_match, best_est,
    n_earlier_matches — best_est is the best cosine) land batch-id-keyed
    under ``sink_path``; read back with neardup.read_decisions. See the
    module docstring for the index layout, pruning, and the p contract."""
    from .index import ROWS_PER_BUCKET, append, batch_dir, compact, read_index

    rpb = ROWS_PER_BUCKET if rows_per_bucket is None else rows_per_bucket

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        emb_p, codes_p, cnt_p = (f"{index_path}/{t}" for t in ("emb", "codes", "cnt"))
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact(spark, emb_p, batch_id, bucket_cols=["doc_id"], rows_per_bucket=rpb)
            compact(spark, codes_p, batch_id, bucket_cols=["code"], rows_per_bucket=rpb)
            if code_cap is not None:
                compact(
                    spark,
                    cnt_p,
                    batch_id,
                    fold=lambda df: df.groupBy("code").agg(F.sum("cnt").alias("cnt")),
                    bucket_cols=["code"],
                    rows_per_bucket=rpb,
                )
            compact(spark, sink_path, batch_id)
        n = spark.sparkContext.defaultParallelism
        d = batch_df.select("doc_id", "text").repartition(n, "doc_id")
        # append FIRST (replay no-op; in-batch pairs via the same
        # doc_a < doc_b path), then read the arriving tables BACK from the
        # appended files so the embed chain runs once
        append(embed_texts(d, dims=dims), emb_p, batch_id)
        aemb = spark.read.parquet(batch_dir(emb_p, batch_id))
        append(codes_of(aemb, n_planes, dims, multiprobe, seed), codes_p, batch_id)
        acodes = spark.read.parquet(batch_dir(codes_p, batch_id))
        frozen = None
        if code_cap is not None:
            append(
                acodes.groupBy("code").agg(F.count(F.lit(1)).alias("cnt")),
                cnt_p,
                batch_id,
            )
            frozen = (
                read_index(spark, cnt_p, prune=(acodes, ["code"]))
                .groupBy("code")
                .agg(F.sum("cnt").alias("cnt"))
                .filter(F.col("cnt") > code_cap)
                .select("code")
            )
        pinned: list[DataFrame] = []

        def pin(df: DataFrame) -> DataFrame:
            df = df.persist()
            df.count()
            pinned.append(df)
            return df

        try:
            icodes = read_index(spark, codes_p, prune=(acodes, ["code"]))
            ac = (
                acodes
                if frozen is None
                else acodes.join(F.broadcast(frozen), ["code"], "left_anti")
            )
            pairs = pin(_candidate_pairs(icodes, ac))
            iemb = read_index(
                spark,
                emb_p,
                prune=(pairs.select(F.col("doc_a").alias("doc_id")), ["doc_id"]),
            )
            verified = _verify(pairs, iemb, aemb, threshold)
            _decisions(batch_df.select("doc_id"), _as_est(verified)).write.mode(
                "overwrite"
            ).parquet(f"{sink_path}/batch-{batch_id:09d}")
        finally:
            for df in pinned:
                df.unpersist()

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
