"""BPE tokenizer training + encoding as a declared query (rows-only).

The last training-pipeline stage the catalog lacked between curation and
packing: FITTING the tokenizer. ``bpe_tokenize_docs`` fits a ranked merge
list on the corpus at call time (operators/bpe.py — one corpus scan to the
word-frequency table, then every merge round iterates the VOCAB table:
one weighted pair-count aggregate + a TakeOrdered(1) argmax + a map-only
rewrite; the driver sees one model row per round) and encodes every doc
with the standard greedy lowest-rank-first BPE encoder (one mapInPandas
pass, word-length-bounded loops).

Rows-only by design: the fit is iterative — ``num_merges`` dependent
rounds, each a global aggregate over the previous round's rewrite — which
a recursive CTE cannot express (no aggregation across rows in the
recursive term); the embedding_ivf_learned_topk / quality_classifier_
learned precedent. The correctness story is the differential one
(the MMR precedent): the planted-corpus merge SEQUENCE equals an
independently written single-machine reference trainer, the fit is
bit-deterministic under repartitioning, and the encoder is lossless
(tokens concatenate back to their words) and matches a reference encoder
— all pinned by tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import bpe_encode, fit_bpe
from ..sources import load_table
from .registry import declare

N_MERGES = 24


@declare(
    "bpe_tokenize_docs",
    oracle=None,  # the fit is iterative (one aggregate per merge round) — not SQL-expressible; correctness is the reference-trainer differential + determinism + losslessness in tests/test_bpe.py
    doc=f"BPE tokenizer trained ON this corpus ({N_MERGES} merges — one "
    f"corpus scan to the word-frequency table, then vocab-table-only merge "
    f"rounds with exact-count argmax and total tiebreaks), then every doc "
    f"encoded with the ranked merges (greedy lowest-rank-first, one "
    f"mapInPandas pass): (doc_id, n_tokens, n_chars, first_tokens). "
    f"Deterministic end to end; the merge sequence matches an independent "
    f"reference trainer and the encoding is lossless per word.",
)
def bpe_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    merges = fit_bpe(d, num_merges=N_MERGES)
    enc = bpe_encode(d, merges)
    return (
        enc.select(
            "doc_id",
            "n_tokens",
            F.expr("CAST(aggregate(tokens, 0, (a, t) -> a + length(t)) AS INT)")
            .alias("n_chars"),
            F.expr("array_join(slice(tokens, 1, 8), ' ')").alias("first_tokens"),
        )
        # barrier-before-orderBy: map-only child (plans/present.py) — the
        # range sampler would re-run the whole Arrow encode pass otherwise
        .repartition("doc_id")
        .orderBy("doc_id")
    )
