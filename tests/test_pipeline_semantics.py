"""Hand-built-input semantics for the training-pipeline stages — the edge
rules the DuckDB differential verifies but doesn't spell out."""

from pyspark.sql import functions as F

from hdfs2cass_spark.plans.pipeline import (
    MIX_QUOTA,
    PACK_BUDGET,
    corpus_mix_quota,
    decontamination_overlap,
    pack_sequences,
    top_ngram_repetition,
)


def _docs_dir(spark, tmp_path, rows):
    d = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    path = str(tmp_path / "docs")
    d.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_pack_straddling_doc_gets_start_offset_bin(spark, tmp_path):
    """A doc crossing a sequence boundary belongs to the bin its FIRST token
    lands in (offset-binned packing): doc 1 starts at offset 200 < 256, so it
    is seq 0 even though it runs past 256."""
    long_a = " ".join(["w"] * 200)
    long_b = " ".join(["w"] * 100)
    path = _docs_dir(
        spark,
        tmp_path,
        [(0, long_a, "en", "s", 1), (1, long_b, "en", "s", 1), (2, "x y", "en", "s", 1)],
    )
    rows = {r.doc_id: r for r in pack_sequences(spark, path).collect()}
    assert rows[0].start_offset == 0 and rows[0].seq_id == 0
    assert rows[1].start_offset == 200 and rows[1].seq_id == 0  # straddles 256
    assert rows[2].start_offset == 300 and rows[2].seq_id == 300 // PACK_BUDGET


def test_decontamination_counts_distinct_shingles_once(spark, tmp_path):
    """A training doc repeating the same contaminated shingle counts it ONCE
    (distinct shingles), and docs under 3 words emit no row."""
    # doc_id 260 hashes into the benchmark set? Avoid relying on that: use
    # ids probed NOT to be benchmark members, and make doc 1 the only
    # benchmark doc by brute-force search.
    from hdfs2cass_spark.plans.pipeline import _BENCH_DUCK

    import duckdb

    con = duckdb.connect()
    is_bench = lambda i: con.execute(
        f"SELECT {_BENCH_DUCK.replace('doc_id', str(i))}"
    ).fetchone()[0]
    bench_id = next(i for i in range(1000) if is_bench(i))
    train_ids = [i for i in range(1000) if not is_bench(i)][:2]
    phrase = "alpha beta gamma"
    path = _docs_dir(
        spark,
        tmp_path,
        [
            (bench_id, phrase, "en", "s", 1),  # benchmark: 1 shingle
            (train_ids[0], f"{phrase} {phrase}", "en", "s", 1),  # repeats it
            (train_ids[1], "xx yy", "en", "s", 1),  # < 3 words: no row
        ],
    )
    rows = {r.doc_id: r for r in decontamination_overlap(spark, path).collect()}
    assert train_ids[1] not in rows and bench_id not in rows
    r = rows[train_ids[0]]
    # "alpha beta gamma alpha beta gamma" yields raw shingles (alpha beta
    # gamma) x2, (beta gamma alpha), (gamma alpha beta) -> 3 DISTINCT, of
    # which exactly one ("alpha beta gamma") is in the benchmark set: the
    # repeat counts once
    assert (r.n_shingles, r.n_contaminated) == (3, 1)
    assert abs(r.contam_frac - 1 / 3) < 1e-12


def test_repetition_fraction_of_top_bigram(spark, tmp_path):
    """'a b a b a' -> bigrams (a b, b a, a b, b a): top fraction 0.5; a
    one-word doc has no bigrams and no row."""
    path = _docs_dir(
        spark, tmp_path, [(0, "a b a b a", "en", "s", 1), (1, "solo", "en", "s", 1)]
    )
    rows = {r.doc_id: r for r in top_ngram_repetition(spark, path).collect()}
    assert 1 not in rows
    assert (rows[0].n_bigrams, rows[0].top_bigram_n, rows[0].rep_frac) == (4, 2, 0.5)


def test_mix_quota_prefers_largest_then_lowest_id(spark, tmp_path):
    rows = [(i, "t", "en", "s", 100 - (i % 2)) for i in range(6)]
    path = _docs_dir(spark, tmp_path, rows)
    got = corpus_mix_quota(spark, path).collect()
    assert len(got) == MIX_QUOTA
    # n_chars 100 for even ids, 99 for odd: keep the lowest even ids first
    assert [r.doc_id for r in got] == [0, 2, 4]
    assert [r.rk for r in got] == [1, 2, 3]


def test_exact_substring_spans_planted_shared_run(spark, tmp_path):
    """Two docs sharing a 12-word run each get 12-8+1=5 duplicated windows in
    one consecutive run; a doc repeating an 8-gram only WITHIN itself has
    df=1 (distinct docs) and no duplicated windows; a 7-word doc emits no
    row."""
    from hdfs2cass_spark.plans.pipeline import SUBSTR_K, exact_substring_spans

    assert SUBSTR_K == 8  # the arithmetic below is pinned to K=8
    shared = " ".join(f"s{i}" for i in range(12))
    doc_a = "a1 a2 a3 " + shared + " a4"  # 16 words -> 9 windows
    doc_b = "b1 " + shared + " b2 b3"  # 15 words -> 8 windows
    inner = " ".join(f"c{i}" for i in range(8))
    doc_c = f"{inner} {inner}"  # 16 words, same 8-gram at pos 1 and 9
    doc_d = "d1 d2 d3 d4 d5 d6 d7"  # 7 words: no windows
    path = _docs_dir(
        spark,
        tmp_path,
        [
            (0, doc_a, "en", "s", 1),
            (1, doc_b, "en", "s", 1),
            (2, doc_c, "en", "s", 1),
            (3, doc_d, "en", "s", 1),
        ],
    )
    rows = {r.doc_id: r for r in exact_substring_spans(spark, path).collect()}
    assert 3 not in rows
    assert (rows[0].n_windows, rows[0].n_dup_windows, rows[0].max_dup_run) == (9, 5, 5)
    assert (rows[1].n_windows, rows[1].n_dup_windows, rows[1].max_dup_run) == (8, 5, 5)
    assert (rows[2].n_windows, rows[2].n_dup_windows, rows[2].max_dup_run) == (9, 0, 0)
    assert abs(rows[0].dup_frac - 5 / 9) < 1e-12


def test_chunk_documents_boundaries_and_overlap(spark, tmp_path):
    """64 words -> exactly one chunk; 65 words -> two chunks with the second
    starting at stride+1 = 49 and keeping the 17-word tail (16-word overlap);
    a 100-word doc chunks at starts 1/49/97; empty and NULL docs emit no
    rows."""
    from hdfs2cass_spark.plans.pipeline import (
        CHUNK_OVERLAP,
        CHUNK_WORDS,
        chunk_documents,
    )

    stride = CHUNK_WORDS - CHUNK_OVERLAP
    mk = lambda n: " ".join(f"w{i}" for i in range(n))
    path = _docs_dir(
        spark,
        tmp_path,
        [
            (0, mk(CHUNK_WORDS), "en", "s", 1),
            (1, mk(CHUNK_WORDS + 1), "en", "s", 1),
            (2, mk(100), "en", "s", 1),
            (3, "", "en", "s", 1),
            (4, None, "en", "s", 1),
        ],
    )
    rows = chunk_documents(spark, path).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc
    # '' splits to one empty-string word under split semantics: 1 chunk of 1
    assert [(r.start_word, r.n_chunk_words) for r in by_doc[3]] == [(1, 1)]
    assert [(r.start_word, r.n_chunk_words) for r in by_doc[0]] == [(1, CHUNK_WORDS)]
    assert [(r.start_word, r.n_chunk_words) for r in by_doc[1]] == [
        (1, CHUNK_WORDS),
        (stride + 1, CHUNK_WORDS + 1 - stride),
    ]
    assert [(r.start_word, r.n_chunk_words) for r in by_doc[2]] == [
        (1, 64),
        (49, 52),
    ]
    # consecutive chunks overlap by exactly CHUNK_OVERLAP words (except tails)
    a, b = by_doc[2][0], by_doc[2][1]
    assert a.start_word + CHUNK_WORDS - b.start_word == CHUNK_OVERLAP


def test_bigram_logprob_flags_word_salad(spark, tmp_path):
    """The LM-score property the filter exists for: a document whose word
    TRANSITIONS are atypical for the corpus (same vocabulary, shuffled
    order) scores strictly below every doc whose transitions the corpus
    repeats — the gibberish/word-salad signal."""
    from pyspark.sql import Row

    from hdfs2cass_spark.plans.lm import bigram_logprob_score

    normal = "the quick brown fox jumps over the lazy dog tonight"
    salad = "dog the over quick tonight brown lazy fox the jumps"
    rows = [Row(doc_id=i, text=normal) for i in range(50)]
    rows.append(Row(doc_id=99, text=salad))
    d = str(tmp_path / "lm")
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    scores = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob_score(spark, d).collect()}
    assert len(scores) == 51
    assert scores[99] < min(scores[i] for i in range(50))
