import pytest
"""bloom_decontamination (plans/bloom.py): the fixed-size twin of the exact
broadcast-set check. Pins the Bloom guarantee — one-sided error — against
decontamination_overlap on the fixture corpus, plus the filter's structure.
(Engine-exactness vs DuckDB is covered by test_catalog_oracle.py like every
oracle row.)"""

from pyspark.sql import functions as F

from hdfs2cass_spark.plans.bloom import (
    _BPW,
    BLOOM_K,
    M_BITS,
    N_WORDS,
    bloom_probe_df,
    bloom_words,
)
from hdfs2cass_spark.plans.registry import CATALOG


@pytest.mark.slow
def test_no_false_negatives_vs_exact_check(spark, sf_dir):
    """Every doc the exact broadcast-set check finds contaminated MUST be
    flagged by the bloom twin (a miss would mean the filter dropped a bit —
    the one failure mode a Bloom filter cannot have); the reverse set
    difference is the measured false-positive count, bounded loosely."""
    exact = {
        r["doc_id"]
        for r in CATALOG["decontamination_overlap"].fn(spark, sf_dir).collect()
        if r["n_contaminated"] > 0
    }
    bloom = CATALOG["bloom_decontamination"].fn(spark, sf_dir).collect()
    flagged = {r["doc_id"] for r in bloom if r["flagged"]}
    assert exact <= flagged, f"bloom MISSED {sorted(exact - flagged)[:5]}"
    # false positives exist but must stay a small minority of clean docs
    clean = len(bloom) - len(exact)
    fps = len(flagged - exact)
    assert clean == 0 or fps / clean < 0.25, (fps, clean)
    # per-shingle dominance too: bloom hit count >= exact contaminated count
    exact_counts = {
        r["doc_id"]: r["n_contaminated"]
        for r in CATALOG["decontamination_overlap"].fn(spark, sf_dir).collect()
    }
    for r in bloom:
        assert r["n_bloom_hits"] >= exact_counts[r["doc_id"]], r["doc_id"]


def test_filter_structure(spark):
    """bloom_words returns exactly N_WORDS int64 words, no word uses the
    top two bits (sign-safety), and a planted hash sets exactly its
    BLOOM_K derived positions."""
    h = 0x123456789ABCDEF  # arbitrary 60-bit value
    df = spark.createDataFrame([(h,)], "h long")
    words = bloom_words(df)
    assert len(words) == N_WORDS
    assert all(w >= 0 for w in words)  # bit 63 never set
    set_bits = {
        wi * _BPW + b
        for wi, w in enumerate(words)
        for b in range(_BPW)
        if w >> b & 1
    }
    expect = {
        ((h % 2**30) + i * (2 * (h >> 30) + 1)) % M_BITS for i in range(BLOOM_K)
    }
    assert set_bits == expect
    # probing the same hash hits; probing a different one (whose positions
    # are not all set) misses
    probe = spark.createDataFrame([(1, h), (2, h ^ 0xFFF000)], "doc_id long, h long")
    got = {r["doc_id"]: r["n_bloom_hits"] for r in bloom_probe_df(probe, words).collect()}
    assert got[1] == 1 and got[2] == 0
