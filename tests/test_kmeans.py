"""Distributed k-means vs a sequential numpy twin replicating the exact
determinism contract (lowest-id init, left-assoc distances, lowest-cell
tiebreak, quantized int64 means)."""

import numpy as np
import pytest

from hdfs2cass_spark.operators.kmeans import Q, assign_cells, fit_kmeans
from hdfs2cass_spark.sources.readers import load_table


def _twin_fit(vecs: np.ndarray, k: int, iters: int) -> list[list[float]]:
    cents = [list(map(float, vecs[i])) for i in range(k)]
    for _ in range(iters):
        cells = []
        for v in vecs:
            best = None
            for j, c in enumerate(cents):
                acc = 0.0
                for x, y in zip(v, c):  # left-assoc, like the Spark aggregate
                    acc = acc + (float(x) - y) * (float(x) - y)
                if best is None or (acc, j) < best:
                    best = (acc, j)
            cells.append(best[1])
        new = [list(c) for c in cents]
        for j in range(k):
            members = [v for v, cell in zip(vecs, cells) if cell == j]
            if members:
                for pos in range(vecs.shape[1]):
                    qs = sum(int(np.floor(float(v[pos]) * Q)) for v in members)
                    new[j][pos] = (qs / Q) / len(members)
        if new == cents:
            break
        cents = new
    return cents


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_fit_kmeans_matches_sequential_twin(spark, emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float32)
    got = fit_kmeans(emb, k=4, iters=3)
    want = _twin_fit(vecs, k=4, iters=3)
    assert got == want


def test_assign_cells_partitions_everything(spark, emb):
    cents = fit_kmeans(emb, k=4, iters=2)
    cells = assign_cells(emb, cents)
    n = emb.count()
    assert cells.count() == n
    dist = {r["cell"] for r in cells.select("cell").distinct().collect()}
    assert dist <= set(range(4)) and len(dist) >= 2


def test_fit_kmeans_requires_k_vectors(spark, emb):
    with pytest.raises(ValueError):
        fit_kmeans(emb.limit(2), k=4, iters=1)
