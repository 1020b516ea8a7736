"""Composed corpus curation: the training-data stages chained as ONE lazy plan.

The individual catalog queries prove each stage against its oracle; this
module proves they COMPOSE the way a production curation pipeline runs them —
quality filter -> exact-dedup keep-first -> decontamination gate -> sequence
packing — as a single DataFrame whose Catalyst plan contains the whole chain
(no materialization, no driver round-trip between stages). At 100 TB that
composition is the difference between one job and four jobs with three
intermediate datasets.

Stage order is the canonical one (cheapest-first, so each shuffle sees fewer
rows): the quality filter is a map-side predicate, keep-first dedup shuffles
the survivors once on the text hash, the decontamination gate aggregates
shingle stats for the remaining docs against the broadcast benchmark set, and
packing lays the final corpus on the token axis with the distributed
prefix-sum. Tested against a DuckDB oracle chain in tests/test_compose.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .llm import SH_ON_WS_SPARK, W_SPARK, hash60_spark
from .pipeline import _BENCH_SPARK, PACK_BUDGET, PACK_SHARD_DOCS

# quality gate: droppable junk a crawl always contains — too-short docs and
# boilerplate-heavy docs with almost no unique words
MIN_WORDS = 5
MIN_UNIQ_RATIO = 0.3
# decontamination gate: drop docs sharing more than this fraction of their
# distinct shingles with the benchmark set
MAX_CONTAM_FRAC = 0.5


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, start_offset, seq_id) for the curated corpus.

    One lazy plan, four stages:
      1. quality filter — in-row predicate (n_words, uniq_ratio), map-only
      2. exact dedup    — keep-first (min doc_id) per md5(text), one shuffle
      3. decontam gate  — per-doc overlap vs the broadcast benchmark shingle
                          set (shingles dedup in-row, corpus never shuffled
                          for the membership check), keep contam_frac < 0.5;
                          benchmark docs themselves are excluded from the
                          training corpus, matching decontamination_overlap
      4. packing        — distributed prefix-sum over the survivors in
                          doc_id order (operators/prefixsum.py)
    """
    from ..operators.prefixsum import exclusive_cumsum

    d = load_table(spark, sf_dir, "documents")

    # --- 1. quality filter (map-only; words array materialized once) ---
    ws = d.select("doc_id", "text", F.expr(W_SPARK).alias("ws")).filter(
        ~F.expr(_BENCH_SPARK)  # benchmark docs are eval data, never training
    )
    q = ws.filter(
        (F.size("ws") >= MIN_WORDS)
        & (F.expr("size(array_distinct(ws))").cast("double") / F.size("ws") >= MIN_UNIQ_RATIO)
    )

    # --- 2. exact dedup, keep-first: min doc_id per text hash ---
    keep = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    deduped = (
        q.withColumn("_rn", F.row_number().over(keep)).filter(F.col("_rn") == 1).drop("_rn")
    )

    # --- 3. decontamination gate (in-row shingle dedup; bench set broadcast) ---
    sh = deduped.select(
        "doc_id", F.explode(F.array_distinct(F.expr(SH_ON_WS_SPARK))).alias("s")
    ).select("doc_id", F.expr(hash60_spark("s")).alias("h"))
    bench = (
        d.filter(F.expr(_BENCH_SPARK))
        .select(F.expr(W_SPARK).alias("ws"))
        .select(F.explode(F.array_distinct(F.expr(SH_ON_WS_SPARK))).alias("s"))
        .select(F.expr(hash60_spark("s")).alias("h"))
        .distinct()
    )
    contam = (
        sh.join(F.broadcast(bench.withColumn("hit", F.lit(1))), "h", "left")
        .groupBy("doc_id")
        .agg((F.count("hit").cast("double") / F.count(F.lit(1))).alias("contam_frac"))
        .filter(F.col("contam_frac") >= MAX_CONTAM_FRAC)
        .select("doc_id")
    )
    clean = deduped.join(contam, "doc_id", "left_anti")

    # --- 4. sequence packing over the curated corpus ---
    toks = clean.select(
        "doc_id", F.expr("CAST(size(ws) AS BIGINT)").alias("n_tokens")
    )
    packed = exclusive_cumsum(
        toks, "doc_id", "n_tokens", out="start_offset", shard_width=PACK_SHARD_DOCS
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {PACK_BUDGET}").alias("seq_id"),
    ).orderBy("doc_id")
