"""Distributed BPE tokenizer training and encoding.

The one training-pipeline stage between curation and packing that the
catalog still lacked: FITTING the tokenizer itself. Byte-pair encoding
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the recipe behind GPT-2/RoBERTa-style tokenizers) learns
a ranked list of symbol-pair merges by repeatedly merging the most
frequent adjacent pair.

Spark-first shape (the classic trainer trick): the corpus is scanned ONCE
to build the word-frequency table — BPE statistics are identical whether
computed over raw text or over (word, count) rows, and the vocab table is
orders of magnitude smaller than the corpus. All ``num_merges`` rounds
then iterate over the VOCAB table: each round is one map-side-combined
pair-count aggregate (weighted by word count) + a TakeOrdered(1) argmax
(count DESC, then lexicographic (left, right) — fully deterministic) + a
map-only rewrite of the symbol arrays. The driver sees ONE model row per
round; the vocab is eagerly re-materialized each round so the plan never
stacks K rewrite stages.

Determinism: counts are exact int64 sums (order-independent), the argmax
tiebreak is total, and the rewrite is a pure function of (symbols, pair)
— a refit under any partitioning yields the identical merge sequence
(asserted, the fit_logreg/kmeans contract), and the planted-corpus merge
sequence equals an independently written single-machine reference trainer
(tests/test_bpe.py).

Encoding applies the ranked merges per word greedily (always the
lowest-rank adjacent pair first — the standard BPE encoder), as a
self-contained ``mapInPandas`` closure (ships to executors without the
repo on PYTHONPATH). The greedy loop runs once per DISTINCT word per
partition — a bounded memo exploits Zipf reuse, so throughput is set by
the corpus's distinct-word rate, not its token count (measured on the
1M-doc bench shape; see bench.py stress_bpe_tokenize_docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import words_spark
from .ckpt import release_checkpoint


def word_counts(d: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the shared whitespace tokenizer — the BPE trainer's
    working set (one corpus scan, map-side combined)."""
    return (
        d.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.expr(words_spark(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def fit_bpe(
    d: DataFrame,
    num_merges: int,
    text_col: str = "text",
    sample_fraction: float | None = None,
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` ranked merges; returns [(left, right), ...].

    ``sample_fraction`` fits on the deterministic hash-sample
    pmod(xxhash64(id), round(1/f)) == 0 (the fit_kmeans/fit_logreg recipe
    — at 100 TB the trainer samples; the vocab statistics converge long
    before the full corpus is seen). Stops early if no adjacent pair
    remains (vocabulary exhausted)."""
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        s = max(1, round(1.0 / sample_fraction))
        d = d.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(s)) == 0)
    # vocab state: (cnt, syms) — initial symbols are the word's characters
    vocab = (
        word_counts(d, text_col)
        .select("cnt", F.split(F.col("word"), "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    pair_expr = (
        "transform(sequence(1, size(syms) - 1), i -> "
        "struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
    )
    for _ in range(int(num_merges)):
        top = (
            vocab.filter(F.size("syms") >= 2)
            .select("cnt", F.explode(F.expr(pair_expr)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        prev = vocab
        vocab = _apply_merge(vocab, left, right).localCheckpoint(eager=True)
        # release the superseded round's checkpoint blocks — without this,
        # num_merges copies of the vocab table accumulate in executor block
        # storage (r8 advice; significant at large distinct-word counts)
        release_checkpoint(prev)
    release_checkpoint(vocab)
    return merges


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array, merging adjacent (left, right) pairs
    left-to-right non-overlapping (the standard BPE pass). A pandas UDF
    (self-contained closure) instead of a SQL fold: symbols are arbitrary
    corpus text, and quoting them into an expression string would be an
    injection hazard."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    lft, rgt = str(left), str(right)
    joined = lft + rgt

    def rewrite(col: "pd.Series") -> "pd.Series":
        out = []
        for syms in col:
            res: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == lft and syms[i + 1] == rgt:
                    res.append(joined)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    rewrite.__annotations__ = {"col": pd.Series, "return": pd.Series}
    f = pandas_udf(rewrite, ArrayType(StringType()))
    return vocab.select("cnt", f("syms").alias("syms"))


def bpe_encode(
    d: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
) -> DataFrame:
    """(id_col, out_col: array<string>, n_tokens) — encode each doc with
    the ranked merges: per word, repeatedly merge the LOWEST-RANK adjacent
    pair (the standard greedy BPE encoder), concatenate words in order.
    One mapInPandas pass; the word-length-bounded merge loop runs once
    per DISTINCT word per partition (bounded memo — Zipf reuse)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rank = {(str(l), str(r)): i for i, (l, r) in enumerate(merges)}
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(out_col, ArrayType(StringType())),
            StructField("n_tokens", IntegerType()),
        ]
    )

    def encode(iterator):
        import re

        import pandas as pd

        # THE shared whitespace definition (functions/tokenize.py): Java's
        # \s set [ \t\n\x0B\f\r] after an ASCII-space-only trim — a bare
        # Python str.split() would ALSO split on Unicode whitespace
        # (U+00A0, U+3000, ...), segmenting the corpus differently than
        # the trainer and breaking per-word losslessness (review finding)
        ws = re.compile("[ \\t\\n\\x0B\\f\\r]+")

        # per-PARTITION distinct-word memo (r9, the encoder's scale fix):
        # encoding is a pure function of the word, and natural corpora are
        # Zipf — the greedy merge loop runs once per DISTINCT word seen by
        # this worker, every repeat is a dict hit. Same "vocab is orders of
        # magnitude smaller than the corpus" argument the trainer rides,
        # WITHOUT the shuffle a distinct-words-join rewrite would add (the
        # rejected alternative: explode->distinct->encode->join->
        # collect_list re-grouping shuffles the whole tokenized corpus
        # twice to save map-side CPU the memo saves for free). Bounded by
        # a BYTE budget (~64 MB per worker, counted on insert — an entry
        # cap alone still admitted hundreds of MB per worker on a
        # high-entropy corpus, r9 review), so an adversarial all-unique-
        # words corpus degrades to the unmemoized cost instead of pushing
        # worker RSS into the OOM killer; measured 3.2x on the 1M-doc
        # bench shape — 775k vs 244k docs/s, and the residual is mostly
        # Arrow/pandas transfer, not the merge loop (see bench.py
        # stress_bpe_tokenize_docs).
        cache: dict[str, list[str]] = {}
        cache_bytes = 0
        cache_budget = 64 * 1024 * 1024

        def enc_word(w: str) -> list[str]:
            nonlocal cache_bytes
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            while len(syms) >= 2:
                best = None
                for i in range(len(syms) - 1):
                    rk = rank.get((syms[i], syms[i + 1]))
                    if rk is not None and (best is None or rk < best[0]):
                        best = (rk, i)
                if best is None:
                    break
                _, i = best
                pair = (syms[i], syms[i + 1])
                # merge EVERY occurrence of this pair left-to-right (the
                # fit-side _apply_merge pass), then rescan for the next rank
                res: list[str] = []
                j = 0
                while j < len(syms):
                    if (
                        j + 1 < len(syms)
                        and (syms[j], syms[j + 1]) == pair
                    ):
                        res.append(syms[j] + syms[j + 1])
                        j += 2
                    else:
                        res.append(syms[j])
                        j += 1
                syms = res
            if cache_bytes < cache_budget:
                # ~bytes: key + tokens + per-object/dict overhead (the 90
                # constant approximates CPython str/list/dict-slot costs)
                cache[w] = syms
                cache_bytes += 2 * len(w) + 90 * (len(syms) + 1)
            return syms

        for pdf in iterator:
            ids, toks, ns = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                out: list[str] = []
                for w in ws.split(str(text).strip(" ")):
                    if w:
                        out.extend(enc_word(w))
                ids.append(int(did))
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({id_col: ids, out_col: toks, "n_tokens": ns})

    return d.select(id_col, text_col).mapInPandas(encode, schema)
