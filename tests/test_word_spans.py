"""exact_substring_word_spans (plans/spans.py): planted-corpus semantics —
maximal duplicated word spans with exact boundary trim, windows merging
across a run, nearby-but-separate spans NOT merging, clean docs absent."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hdfs2cass_spark.plans import CATALOG

SHARED12 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
SHARED8 = "one two three four five six seven eight"

DOCS = [
    # doc 0: 12-word dup at words 3..14, two unique words, 8-word dup at 17..24
    "u0 u1 " + SHARED12 + " u2 u3 " + SHARED8 + " u4",
    # doc 1: the 12-word phrase flush at the start
    SHARED12 + " zz1 zz2 zz3",
    # doc 2: the 8-word phrase starting at word 2
    "yy1 " + SHARED8,
    # doc 3: >= 8 unique words, no duplicated window -> no span rows at all
    "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10",
]


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("span_docs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
                "lang": pa.array(["en"] * len(DOCS), pa.string()),
                "source": pa.array(["t"] * len(DOCS), pa.string()),
                "n_chars": pa.array([len(t) for t in DOCS], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_planted_span_boundaries(spark, planted_sf):
    rows = CATALOG["exact_substring_word_spans"].fn(spark, planted_sf).collect()
    got = {(r["doc_id"], r["span_start"], r["span_n_words"]) for r in rows}
    # doc 0: the 12-word phrase spans 5 consecutive dup windows (3..7) ->
    # ONE merged span [3, 14]; the 8-word phrase is one window at 17 and
    # 17 > 7 + 8, so it stays a SEPARATE span [17, 24]
    assert got == {
        (0, 3, 12),
        (0, 17, 8),
        (1, 1, 12),
        (2, 2, 8),
    }
    # span content digests: the same phrase yields the same fp everywhere
    fp = {(r["doc_id"], r["span_start"]): r["span_fp"] for r in rows}
    assert fp[(0, 3)] == fp[(1, 1)]  # the 12-word phrase
    assert fp[(0, 17)] == fp[(2, 2)]  # the 8-word phrase
    assert fp[(0, 3)] != fp[(0, 17)]


def test_overlapping_windows_merge_into_one_span(spark, tmp_path):
    """Two dup windows whose word intervals overlap but are NOT consecutive
    positions (gap window in between is unique) must still merge: pos 1 and
    pos 6 with K=8 cover [1,8] and [6,13] -> one span [1,13]."""
    # doc A and B share words 1..8; doc A and C share words 6..13; the
    # middle windows (2..5) of doc A mix both regions and are unique to A
    a = "w1 w2 w3 w4 w5 w6 w7 w8 x9 x10 x11 x12 x13"
    b = "w1 w2 w3 w4 w5 w6 w7 w8 yy1 yy2"
    c = "zz0 zz1 w6 w7 w8 x9 x10 x11 x12 x13"
    docs = [a, b, c]
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "ov"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["t"] * 3, pa.string()),
                "n_chars": pa.array([len(t) for t in docs], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    rows = CATALOG["exact_substring_word_spans"].fn(spark, str(d)).collect()
    got = {(r["doc_id"], r["span_start"], r["span_n_words"]) for r in rows}
    # doc 0: dup windows at pos 1 (shared with doc 1) and pos 6 (shared with
    # doc 2, covering words 6..13); 6 <= 1 + 8 -> merged, span [1, 13]
    assert (0, 1, 13) in got
    assert sum(1 for g in got if g[0] == 0) == 1
