"""MMR reranking (operators/rerank.py + plans/mmr.py): the diversity
property on planted candidates, selection invariants, and the twin
contract. Cross-engine trajectory equality is the oracle's job
(rag_mmr_rerank_md5 hash-matches the DuckDB recursive-CTE twin at two
scale factors via the catalog gate)."""

import math

import pytest
from pyspark.sql import functions as F

from hdfs2cass_spark.operators.rerank import mmr_rerank
from hdfs2cass_spark.plans.registry import CATALOG


def _unit(*vals):
    n = math.sqrt(sum(v * v for v in vals))
    return [float(v / n) for v in vals] + [0.0] * (64 - len(vals))


def _cands(spark, rows):
    return spark.createDataFrame(
        rows, "q_id long, doc_id long, chunk_id int, cosine double, cembedding array<float>"
    )


def test_mmr_demotes_the_near_duplicate(spark):
    """The reason MMR exists: candidate B is a near-copy of the top hit A
    (cos(A,B) ~ 1), candidate C is less relevant but orthogonal. Plain
    top-k ranks A, B, C; MMR must select A, then C (B's redundancy penalty
    ~ its full relevance), then B."""
    a = _unit(1.0, 0.0)
    b = _unit(0.999, 0.01)  # near-copy of a
    c = _unit(0.0, 1.0)  # orthogonal
    rows = [
        (0, 10, 0, 0.9, a),
        (0, 11, 0, 0.89, b),
        (0, 12, 0, 0.5, c),
    ]
    got = mmr_rerank(_cands(spark, rows), k=3).collect()
    assert [(r["doc_id"], r["sel_rank"]) for r in got] == [(10, 1), (12, 2), (11, 3)]
    # step-1 score is half the relevance (maxsim over the empty set is 0)
    assert got[0]["mmr_score"] == pytest.approx(0.45)
    # the near-dup's score carries the ~1.0 redundancy penalty
    assert got[2]["mmr_score"] < 0


def test_mmr_selection_invariants(spark):
    """k-bounded output, 1..k ranks, ties broken on (doc_id, chunk_id),
    cosine preserved through quantization."""
    e1, e2, e3 = _unit(1, 0, 0), _unit(0, 1, 0), _unit(0, 0, 1)
    rows = [
        (0, 2, 1, 0.7, e1),
        (0, 2, 0, 0.7, e2),  # tie with (2,1): lower chunk_id wins
        (0, 1, 5, 0.7, e3),  # tie: lowest doc_id wins overall
        (1, 9, 0, 0.3, e1),  # second query group, single candidate
    ]
    got = {r["q_id"]: [] for r in []}
    out = mmr_rerank(_cands(spark, rows), k=2).collect()
    q0 = [r for r in out if r["q_id"] == 0]
    q1 = [r for r in out if r["q_id"] == 1]
    assert [r["sel_rank"] for r in q0] == [1, 2]
    assert (q0[0]["doc_id"], q0[0]["chunk_id"]) == (1, 5)
    # second pick: orthogonal candidates tie on score -> (2, 0) over (2, 1)
    assert (q0[1]["doc_id"], q0[1]["chunk_id"]) == (2, 0)
    assert [round(r["cosine"], 6) for r in q0] == [0.7, 0.7]
    assert len(q1) == 1 and q1[0]["sel_rank"] == 1


def test_mmr_matches_independent_reference_on_random_candidates(spark):
    """Differential check against an independently written greedy MMR
    (different data layout, same quantization contract) over seeded random
    candidate sets — catches selection-loop bugs the planted cases miss."""
    import random

    for seed in (3, 17, 41):
        rng = random.Random(seed)
        rows = []
        for q in range(3):
            for j in range(8):
                vec = [rng.uniform(-1, 1) for _ in range(8)]
                n = math.sqrt(sum(v * v for v in vec))
                emb = [float(v / n) for v in vec] + [0.0] * 56
                rows.append((q, 100 + j, j % 3, round(rng.uniform(0, 1), 6), emb))
        got = mmr_rerank(_cands(spark, rows), k=4).collect()

        # reference: plain-python greedy on the same quantization contract
        def ref(q_rows, k):
            cs = []
            for _, did, cid, rel, emb in q_rows:
                cs.append((did, cid, math.floor(rel * 1e6 + 0.5), emb))
            sel, out = [], []
            while cs and len(sel) < k:
                scored = []
                for did, cid, rq, emb in cs:
                    sims = []
                    for _, _, _, semb in sel:
                        na = nb = dot = 0.0
                        for x in emb:
                            na += x * x
                        for x in semb:
                            nb += x * x
                        den = math.sqrt(na) * math.sqrt(nb)
                        if den == 0:
                            continue
                        for x, y in zip(emb, semb):
                            dot = dot + x * y
                        sims.append(math.floor((dot / den) * 1e6 + 0.5))
                    msq = max(sims) if sims else 0
                    scored.append(((-(rq - msq), did, cid), (did, cid, rq, emb)))
                scored.sort(key=lambda t: t[0])
                pick = scored[0][1]
                cs = [c for c in cs if (c[0], c[1]) != (pick[0], pick[1])]
                sel.append(pick)
                out.append((pick[0], pick[1], len(sel)))
            return out

        for q in range(3):
            want = ref([r for r in rows if r[0] == q], 4)
            have = [
                (r["doc_id"], r["chunk_id"], r["sel_rank"])
                for r in got
                if r["q_id"] == q
            ]
            assert have == want, (seed, q)


def test_mmr_oracle_matches_when_pool_smaller_than_k(spark, tmp_path):
    """A query with FEWER candidates than k: the Spark loop stops early and
    the recursive-CTE oracle must stop with it instead of padding NULL
    picks (review finding). 2 short non-query docs -> 2 candidates per
    query < k=5; both engines must emit exactly 2 rows per query."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hdfs2cass_spark.plans.registry import CATALOG

    texts = [
        "alpha beta gamma delta", "beta gamma delta epsilon",
        "gamma delta epsilon zeta",  # doc_ids 0-2: the query docs
        "alpha beta gamma epsilon zeta", "delta epsilon zeta alpha beta",
    ]
    d = tmp_path / "mmr_small"
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
    got = CATALOG["rag_mmr_rerank_md5"].fn(spark, str(d)).toPandas()
    # each query sees the 4 OTHER docs' single chunks: 4 candidates < k=5
    assert sorted(got.groupby("q_id").size().tolist()) == [4, 4, 4]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    want = con.execute(CATALOG["rag_mmr_rerank_md5"].oracle).fetchdf()
    assert len(want) == len(got)
    for col in got.columns:
        for g, w in zip(got[col].tolist(), want[col].tolist()):
            assert (g == w) or (abs(g - w) < 1e-12), (col, g, w)


def test_mmr_twins_share_shape_and_diversify(spark, sf_dir):
    """Both declared twins return the same schema and their selections are
    no less diverse than the plain retrieval's top-k (the MMR guarantee on
    an overlap-chunked corpus: adjacent chunks of one doc stop crowding
    the result list)."""
    md5 = CATALOG["rag_mmr_rerank_md5"].fn(spark, sf_dir)
    xx = CATALOG["rag_mmr_rerank"].fn(spark, sf_dir)
    assert md5.columns == xx.columns == [
        "q_id", "doc_id", "chunk_id", "cosine", "mmr_score", "sel_rank",
    ]
    a, b = md5.collect(), xx.collect()
    assert len(a) == len(b) > 0
    plain = CATALOG["rag_chunk_retrieval_md5"].fn(spark, sf_dir).collect()

    def n_docs(rows):
        return len({(r["q_id"], r["doc_id"]) for r in rows})

    # per (query, doc) multiplicity can only drop under MMR
    assert n_docs(a) >= n_docs(plain)