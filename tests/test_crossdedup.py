"""Semantics tests for cross-corpus dedup (plans/crossdedup.py).

The differential oracle proves cross-engine exactness; these prove the
CROSS semantics: exact copies and near copies of REFERENCE docs are
flagged, while duplicates entirely WITHIN the new side are not (that is
the single-corpus operators' job), and reference docs are never output.
"""

from __future__ import annotations

import pytest

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


def _dedup(spark, fast: bool = False):
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
    return {r.doc_id: r for r in cross_dedup_df(new, ref, fast=fast).collect()}


@pytest.mark.parametrize("fast", [False, True])
def test_cross_dedup_flags(spark, fast):
    out = _dedup(spark, fast)
    assert sorted(out) == [10, 11, 12, 13, 14]  # new docs only, never ref
    assert out[10].exact_dup and out[10].near_dup and not out[10].keep
    assert not out[11].exact_dup and out[11].near_dup and not out[11].keep
    # new-vs-new duplicates are NOT this operator's concern
    assert out[12].keep and out[13].keep
    assert not out[13].exact_dup and not out[13].near_dup
    assert out[14].keep  # NULL text never matches anything


def test_fast_twin_recovers_same_planted_cross_dups(spark):
    """TWINS invariant for dedup_against_reference_fast (the
    minhash_lsh_pairs_fast precedent): on a corpus with PLANTED cross-corpus
    duplicates — 25 exact copies and 25 one-word-appended near copies
    (shingle jaccard ~0.97, per-family LSH catch probability > 0.999) of
    reference docs planted into the new side, plus 200 unrelated new docs —
    the xxhash64 production twin and the md5 (DuckDB hash-checked) twin
    must flag the SAME planted docs. exact_dup must agree EXACTLY (the text
    hash is injective up to collisions on both families); near_dup up to
    the banding-probability budget."""
    import pyspark.sql.functions as F

    from hdfs2cass_spark.plans.crossdedup import cross_dedup_df

    n_ref, n_exact, n_near, n_bg = 50, 25, 25, 200
    words = (
        "array_join(transform(sequence(1, 100), "
        "j -> concat('w', pmod(hash(cid * 31 + j), 50000))), ' ')"
    )
    ref = spark.range(n_ref).select(
        F.col("id").alias("doc_id"), F.expr(words.replace("cid", "id")).alias("text")
    )
    exact = spark.range(n_exact).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.expr(words.replace("cid", "id")).alias("text"),
    )
    near = spark.range(n_near).select(
        (F.col("id") + 2000).alias("doc_id"),
        F.concat(
            F.expr(words.replace("cid", "(id + 25)")), F.lit(" zextra")
        ).alias("text"),
    )
    bg = spark.range(n_bg).select(
        (F.col("id") + 3000).alias("doc_id"),
        F.expr(words.replace("cid", "(id + 90000)")).alias("text"),
    )
    new = exact.unionAll(near).unionAll(bg)
    md5 = {r.doc_id: r for r in cross_dedup_df(new, ref).collect()}
    xxh = {r.doc_id: r for r in cross_dedup_df(new, ref, fast=True).collect()}
    assert sorted(md5) == sorted(xxh)
    # exact flags agree exactly and catch every planted exact copy
    assert {i for i, r in md5.items() if r.exact_dup} == {
        i for i, r in xxh.items() if r.exact_dup
    } == {1000 + i for i in range(n_exact)}
    # near flags: each family individually near-certain on the planted
    # copies, zero false positives on background, symmetric diff bounded
    planted_near = {2000 + i for i in range(n_near)}
    m_near = {i for i, r in md5.items() if r.near_dup and i >= 2000}
    x_near = {i for i, r in xxh.items() if r.near_dup and i >= 2000}
    assert not (m_near - planted_near) and not (x_near - planted_near)
    assert len(planted_near - m_near) <= 2, "md5 twin missed planted near-dups"
    assert len(planted_near - x_near) <= 2, "fast twin missed planted near-dups"
    assert len(m_near ^ x_near) <= 4


def test_cross_dedup_empty_reference(spark):
    ref = spark.createDataFrame([], "doc_id long, text string")
    new = spark.createDataFrame([(1, BASE_A)], "doc_id long, text string")
    rows = cross_dedup_df(new, ref).collect()
    assert len(rows) == 1 and rows[0].keep
