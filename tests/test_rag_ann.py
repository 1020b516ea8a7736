"""retrieve_topk_ann (plans/rag.py): the production ANN twin of the exact
RAG retrieval path. Pins — the IVF-twin pattern (tests/test_kmeans.py):

  - recall >= 0.9 vs the oracle-checked exact retrieve_topk at sf0.01 (the
    shape the committed p=8/radius=3 parameters were chosen at; measured
    1.0 there) — a parameter or plane regression fails loudly;
  - identical output contract (columns, rnk density, self-doc exclusion);
  - the _with_code keep= carry is a pure pass-through in BOTH code branches
    (codegen p <= 10 and the pandas-UDF matmul past it);
  - probe_masks is exactly the Hamming ball.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from hdfs2cass_spark.operators.hyperplane import _with_code, lsh_planes, probe_masks
from hdfs2cass_spark.plans.rag import (
    chunk_embeddings,
    query_embeddings,
    retrieve_topk,
    retrieve_topk_ann,
)
from hdfs2cass_spark.sources import load_table

SF001 = "/root/testdata/sf0.01"


def test_probe_masks_is_the_hamming_ball():
    for p, r in [(4, 0), (4, 2), (8, 3)]:
        got = sorted(probe_masks(p, r))
        want = sorted(
            m for m in range(1 << p) if bin(m).count("1") <= r
        )
        assert got == want
    assert probe_masks(8, 3)[0] == 0  # own code probed first


@pytest.fixture(scope="module")
def embedded(spark):
    d = load_table(spark, SF001, "documents")
    cemb = chunk_embeddings(d).localCheckpoint()
    qemb = query_embeddings(d).localCheckpoint()
    return cemb, qemb


def test_ann_recall_vs_exact_floor(spark, embedded):
    """The committed floor: recall >= 0.9 at the sf0.01 fixture shape with
    the declared query's parameters (p=8, radius=3; measured 1.0)."""
    cemb, qemb = embedded
    exact = {
        (r.q_id, r.doc_id, r.chunk_id)
        for r in retrieve_topk(cemb, qemb, k=5).collect()
    }
    ann = {
        (r.q_id, r.doc_id, r.chunk_id)
        for r in retrieve_topk_ann(cemb, qemb, k=5, n_planes=8, radius=3).collect()
    }
    assert exact, "exact baseline returned nothing — fixture problem"
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.9, f"ANN recall {recall:.3f} < 0.9 vs exact top-5"


def test_ann_output_contract_matches_exact(spark, embedded):
    """Same columns, dense rnk 1..k per query, self-doc excluded, cosines
    are true exact cosines (every ANN hit's cosine equals the exact path's
    cosine for the same (q, doc, chunk))."""
    cemb, qemb = embedded
    exact = retrieve_topk(cemb, qemb, k=5)
    ann = retrieve_topk_ann(cemb, qemb, k=5, n_planes=8, radius=3)
    assert ann.columns == exact.columns
    rows = ann.collect()
    by_q: dict = {}
    for r in rows:
        assert r.doc_id != r.q_id
        by_q.setdefault(r.q_id, []).append(r.rnk)
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), q
    exact_cos = {
        (r.q_id, r.doc_id, r.chunk_id): r.cosine
        for r in retrieve_topk(cemb, qemb, k=10_000).collect()
    }
    for r in rows:
        key = (r.q_id, r.doc_id, r.chunk_id)
        assert exact_cos[key] == r.cosine, key


def test_derived_planes_path_runs(spark, embedded):
    """n_planes=None derives p from the chunk count (the at-scale default);
    the derived-p path must produce the contract shape too."""
    cemb, qemb = embedded
    rows = retrieve_topk_ann(cemb, qemb, k=3).collect()
    assert rows and all(r.rnk <= 3 for r in rows)


@pytest.mark.parametrize("p", [8, 12])  # codegen branch and UDF branch
def test_with_code_keep_is_pure_passthrough(spark, p):
    """keep= must not perturb the code in either branch, and the carried
    column must come through bit-identical."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    planes = lsh_planes(p, 16)
    plain = {r._id: r.code for r in _with_code(df, planes, "vid", "v").collect()}
    kept = _with_code(df, planes, "vid", "v", keep=("v",)).collect()
    assert {r._id: r.code for r in kept} == plain
    orig = {r.vid: r.v for r in df.collect()}
    for r in kept:
        assert r.v == orig[r._id]


def test_declared_query_registered():
    from hdfs2cass_spark.plans.registry import CATALOG

    q = CATALOG["rag_retrieval_ann"]
    assert q.oracle is None  # rows-only by documented design
    assert "recall" in q.doc


def _hamming_ball_size(p, r):
    return sum(
        1 for _ in itertools.chain.from_iterable(
            itertools.combinations(range(p), i) for i in range(r + 1)
        )
    ) + 1  # r=0 term (empty combination) counts once


def test_candidate_generation_is_bucket_bounded(spark, embedded):
    """The plan never evaluates cosine on more than (probed-bucket load)
    candidates: with an adversarial p that isolates every chunk, the probe
    ball bounds candidates per query — checked by counting the candidate
    rows the ANN plan scores vs the exact path's full cross product."""
    cemb, qemb = embedded
    n_chunks = cemb.count()
    n_q = qemb.count()
    # reuse the internals: count bucket-matched candidate rows at p=8/r=1
    from hdfs2cass_spark.plans.rag import _DIMS

    planes = lsh_planes(8, _DIMS)
    ck = cemb.select(F.struct("doc_id", "chunk_id").alias("ckey"), "cembedding")
    coded = _with_code(ck, planes, "ckey", "cembedding")
    qc = _with_code(qemb, planes, "q_id", "qe")
    masks = spark.createDataFrame([(m,) for m in probe_masks(8, 1)], "mask long")
    probes = qc.crossJoin(masks).select(
        F.col("_id").alias("q_id"),
        F.col("code").bitwiseXOR(F.col("mask")).alias("code"),
    )
    n_cand = coded.join(probes, "code").count()
    assert n_cand < n_q * n_chunks, "radius-1 probing should prune the cross product"
