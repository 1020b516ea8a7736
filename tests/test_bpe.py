"""Distributed BPE trainer/encoder (operators/bpe.py): the merge sequence
against an independently written single-machine reference trainer,
bit-deterministic refit under repartitioning, encoder losslessness, and
the declared rows-only query's invariants."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hdfs2cass_spark.operators.bpe import bpe_encode, fit_bpe
from hdfs2cass_spark.plans.registry import CATALOG


def _ref_fit(word_counts: dict[str, int], k: int) -> list[tuple[str, str]]:
    """Independent single-machine BPE trainer (dict-based, no Spark):
    same spec — most frequent adjacent pair, ties by lexicographic
    (left, right), left-to-right non-overlapping rewrite."""
    vocab = {w: (list(w), c) for w, c in word_counts.items()}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        l, r = best
        for w, (syms, c) in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = (res, c)
    return merges


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    rank = {m: i for i, m in enumerate(merges)}
    syms = list(word)
    while len(syms) >= 2:
        cands = [
            (rank[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in rank
        ]
        if not cands:
            break
        _, i = min(cands)
        l, r = syms[i], syms[i + 1]
        res, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                res.append(l + r)
                j += 2
            else:
                res.append(syms[j])
                j += 1
        syms = res
    return syms


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low new wide slow slower",
]


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_docs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
                "lang": pa.array(["en"] * len(TEXTS), pa.string()),
                "source": pa.array(["t"] * len(TEXTS), pa.string()),
                "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def _planted_counts():
    wc: dict[str, int] = {}
    for t in TEXTS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_fit_matches_reference_trainer(spark, planted_sf):
    from hdfs2cass_spark.sources.readers import load_table

    d = load_table(spark, planted_sf, "documents")
    got = fit_bpe(d, num_merges=12)
    want = _ref_fit(_planted_counts(), 12)
    assert got == want
    # the corpus's dominant pattern surfaces early: 'lo'/'wi'-style merges
    assert len(got) == 12


@pytest.mark.slow
def test_fit_is_deterministic_under_repartitioning(spark, planted_sf):
    from hdfs2cass_spark.sources.readers import load_table

    d = load_table(spark, planted_sf, "documents")
    a = fit_bpe(d.repartition(1), num_merges=8)
    b = fit_bpe(d.repartition(5, "doc_id"), num_merges=8)
    assert a == b


def test_encode_lossless_and_matches_reference(spark, planted_sf):
    from hdfs2cass_spark.sources.readers import load_table

    d = load_table(spark, planted_sf, "documents")
    merges = fit_bpe(d, num_merges=10)
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(d, merges).collect()}
    for i, t in enumerate(TEXTS):
        words = t.split()
        # losslessness: tokens concatenate back to the words in order
        assert "".join(enc[i]) == "".join(words)
        # and match the reference encoder word by word
        want = [tok for w in words for tok in _ref_encode(w, merges)]
        assert enc[i] == want


@pytest.mark.slow
def test_fit_and_encode_fuzz_vs_reference(spark, tmp_path):
    """Seeded random corpora (random small-alphabet words, random
    frequencies) — the trainer's merge sequence and the encoder's output
    must match the independent reference on every one. Catches argmax /
    rewrite / greedy-order bugs the planted corpus can't reach."""
    import random

    for seed in (5, 19, 73):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
            for _ in range(30)
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 15)))
            for _ in range(20)
        ]
        d = tmp_path / f"bpe_fuzz_{seed}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * len(texts), pa.string()),
                    "source": pa.array(["t"] * len(texts), pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            d / "documents.parquet",
        )
        from hdfs2cass_spark.sources.readers import load_table

        docs = load_table(spark, str(d), "documents")
        merges = fit_bpe(docs, num_merges=10)
        wc: dict[str, int] = {}
        for t in texts:
            for w in t.split():
                wc[w] = wc.get(w, 0) + 1
        assert merges == _ref_fit(wc, 10), seed
        enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, merges).collect()}
        for i, t in enumerate(texts):
            want = [tok for w in t.split() for tok in _ref_encode(w, merges)]
            assert enc[i] == want, (seed, i)


def test_encoder_tokenizer_matches_trainer_on_unicode_whitespace(spark, tmp_path):
    """The trainer segments with the shared Java-\\s tokenizer; the encoder
    must segment IDENTICALLY — a doc with Unicode whitespace (U+00A0,
    U+3000: word characters to Java \\s, whitespace to Python str.split)
    is the divergence probe (review finding)."""
    text = "foo bar baz　qux foo bar"
    d = tmp_path / "bpe_uni"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([text], pa.string()),
                "lang": pa.array(["en"], pa.string()),
                "source": pa.array(["t"], pa.string()),
                "n_chars": pa.array([len(text)], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    from hdfs2cass_spark.sources.readers import load_table

    docs = load_table(spark, str(d), "documents")
    merges = fit_bpe(docs, num_merges=6)
    # the shared tokenizer splits on the ASCII space only: two distinct words
    words = ["foo bar", "baz　qux", "foo bar"]
    assert merges == _ref_fit({"foo bar": 2, "baz　qux": 1}, 6)
    enc = bpe_encode(docs, merges).collect()[0]["tokens"]
    assert "".join(enc) == "".join(words)  # lossless incl. the U+00A0/U+3000
    assert enc == [t for w in words for t in _ref_encode(w, merges)]


def test_declared_query_invariants(spark, sf_dir):
    rows = CATALOG["bpe_tokenize_docs"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows[:50]:
        # merging can only shorten: token count <= char count, >= 1 token
        # per word; chars are conserved (whitespace excluded both sides)
        assert 1 <= r["n_tokens"] <= r["n_chars"]
        assert r["first_tokens"]
    # merges did real work: some doc has fewer tokens than characters
    assert any(r["n_tokens"] < r["n_chars"] for r in rows)
