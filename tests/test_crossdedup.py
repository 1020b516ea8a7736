"""Semantics tests for cross-corpus dedup (plans/crossdedup.py).

The differential oracle proves cross-engine exactness; these prove the
CROSS semantics: exact copies and near copies of REFERENCE docs are
flagged, while duplicates entirely WITHIN the new side are not (that is
the single-corpus operators' job), and reference docs are never output.
"""

from __future__ import annotations

from hdfs2cass_spark.plans.crossdedup import cross_dedup_df

BASE_A = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
BASE_B = (
    "uniform victor whiskey xray yankee zulu one two three four "
    "five six seven eight nine ten eleven twelve thirteen fourteen"
)
UNRELATED = (
    "red orange yellow green blue indigo violet crimson teal maroon "
    "amber coral jade pearl onyx ruby topaz quartz slate bronze"
)


def _dedup(spark):
    ref = spark.createDataFrame(
        [(0, BASE_A), (3, BASE_B)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, BASE_A),  # exact copy of reference doc 0
            (11, BASE_B.replace("seven", "SEVEN7")),  # near copy of ref doc 3
            (12, UNRELATED),
            (13, UNRELATED),  # exact dup of doc 12 — but WITHIN the new side
            (14, None),  # NULL text: no shingles, never matches
        ],
        "doc_id long, text string",
    )
    return {r.doc_id: r for r in cross_dedup_df(new, ref).collect()}


def test_cross_dedup_flags(spark):
    out = _dedup(spark)
    assert sorted(out) == [10, 11, 12, 13, 14]  # new docs only, never ref
    assert out[10].exact_dup and out[10].near_dup and not out[10].keep
    assert not out[11].exact_dup and out[11].near_dup and not out[11].keep
    # new-vs-new duplicates are NOT this operator's concern
    assert out[12].keep and out[13].keep
    assert not out[13].exact_dup and not out[13].near_dup
    assert out[14].keep  # NULL text never matches anything


def test_cross_dedup_empty_reference(spark):
    ref = spark.createDataFrame([], "doc_id long, text string")
    new = spark.createDataFrame([(1, BASE_A)], "doc_id long, text string")
    rows = cross_dedup_df(new, ref).collect()
    assert len(rows) == 1 and rows[0].keep
