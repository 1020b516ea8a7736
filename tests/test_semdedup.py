"""SemDeDup invariants: the exact-duplicate collapse is semantics-exact vs a
naive pairwise twin, planted duplicates always drop, zero vectors never do,
and the learned-model query is deterministic. (The fixture-model query's
values are oracle-checked by test_catalog_oracle.py; these tests pin the
paths the synthetic fixture cannot reach — identical-vector mass, zero
vectors, rep-inheritance.)"""

import numpy as np
import pytest

from hdfs2cass_spark.plans import CATALOG
from hdfs2cass_spark.plans.semdedup import _TAU, semdedup_df


def _df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _naive(vecs, cents, tau):
    """Driver-side reference: assign by quantized L2 (first-minimum), then
    the raw within-cell smaller-id pairwise rule — NO collapse."""
    V = np.array([np.asarray(v, dtype=np.float32) for v in vecs], dtype=np.float64)
    C = np.array(cents, dtype=np.float64)
    d = np.floor(((V[:, None, :] - C[None, :, :]) ** 2) * 1e12).astype(np.int64).sum(2)
    cell = d.argmin(1)
    n = np.sqrt((V * V).sum(1))
    kept = []
    for i in range(len(V)):
        dup = False
        for j in range(i):
            if cell[j] != cell[i] or n[i] == 0 or n[j] == 0:
                continue
            if round(float(V[i] @ V[j]) / float(n[i] * n[j]), 6) > tau:
                dup = True
                break
        kept.append(not dup)
    return cell, kept


@pytest.fixture(scope="module")
def cents():
    rng = np.random.default_rng(7)
    return [[float(x) for x in rng.normal(size=8)] for _ in range(3)]


def test_collapse_matches_naive_pairwise_on_random_corpus(spark, cents):
    """The group-rep optimization must be invisible: random vectors with
    planted exact-duplicate mass and near-duplicates give the same keep set
    as the naive all-pairs rule."""
    rng = np.random.default_rng(11)
    base = [rng.normal(size=8) for _ in range(40)]
    vecs = list(base)
    vecs += [base[3]] * 5  # identical mass
    vecs += [base[7] + rng.normal(scale=1e-3, size=8)]  # near-dup
    vecs += [np.zeros(8), np.zeros(8)]  # zero vectors (identical group)
    got = {
        r.vec_id: (r.cell, r.is_kept)
        for r in semdedup_df(_df(spark, vecs), cents, tau=0.8).collect()
    }
    cell, kept = _naive(vecs, cents, 0.8)
    for i in range(len(vecs)):
        assert got[i] == (cell[i], kept[i]), f"vec {i}: {got[i]} != {(cell[i], kept[i])}"


def test_identical_vectors_keep_exactly_the_lowest_id(spark, cents):
    v = np.random.default_rng(3).normal(size=8)
    out = {r.vec_id: r.is_kept for r in semdedup_df(_df(spark, [v] * 6), cents, tau=0.9).collect()}
    assert out == {0: True, 1: False, 2: False, 3: False, 4: False, 5: False}


def test_zero_vectors_are_never_duplicates(spark, cents):
    vecs = [np.zeros(8)] * 4 + [np.random.default_rng(5).normal(size=8)]
    out = semdedup_df(_df(spark, vecs), cents, tau=0.5).collect()
    assert all(r.is_kept for r in out)


def test_rep_inherits_dup_status_from_smaller_id_neighbor(spark, cents):
    """vec 0 near vec 1; vecs 1-3 identical. The identical group's rep (1)
    must drop via its cosine to 0, and the members via the collapse."""
    rng = np.random.default_rng(9)
    a = rng.normal(size=8)
    b = a + rng.normal(scale=1e-4, size=8)
    out = {r.vec_id: r.is_kept for r in semdedup_df(_df(spark, [a, b, b, b]), cents, tau=0.99).collect()}
    assert out == {0: True, 1: False, 2: False, 3: False}


def test_tau_ge_one_rejected(spark, cents):
    with pytest.raises(ValueError):
        semdedup_df(_df(spark, [np.ones(8)]), cents, tau=1.0)


def test_learned_query_planted_and_deterministic(spark, sf_dir, tmp_path):
    """The learned twin must drop planted exact copies regardless of what
    model the fit produces, and refitting on the same data must reproduce
    the identical keep set (fit_kmeans is deterministic by contract)."""
    rng = np.random.default_rng(17)
    vecs = [rng.normal(size=64) for _ in range(60)]
    vecs += [vecs[5], vecs[5], vecs[20]]  # ids 60,61 copy 5; id 62 copies 20
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    q = CATALOG["semantic_dedup_learned"].fn
    first = {r.vec_id: (r.cell, r.is_kept) for r in q(spark, str(tmp_path)).collect()}
    assert first[60][1] is False and first[61][1] is False and first[62][1] is False
    assert first[5][0] == first[60][0] == first[61][0]  # identical -> same cell
    again = {r.vec_id: (r.cell, r.is_kept) for r in q(spark, str(tmp_path)).collect()}
    assert first == again


def test_fixture_query_drop_rate_sane(spark, sf_dir):
    out = CATALOG["semantic_dedup"].fn(spark, sf_dir).collect()
    n, dropped = len(out), sum(1 for r in out if not r.is_kept)
    assert n > 0 and 0 < dropped < n  # tau exercises both branches at every SF
    assert _TAU < 1
