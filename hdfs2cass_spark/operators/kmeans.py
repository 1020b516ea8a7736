"""Deterministic distributed k-means (Lloyd's) over an array<float> column.

The IVF index's coarse quantizer: cells should be LEARNED from the vectors,
not taken from a label column. This is the standard broadcast-model pattern —
the model (k x dims centroids) lives driver-side and is broadcast into the
assignment expression each round; the DATA never leaves the cluster, each
iteration is one codegen'd scan + one groupBy, and the driver receives only
k*dims aggregated scalars per round (the new model), independent of row count.

Determinism (so a DuckDB twin or a re-run reproduces the same model):
  - init: the k vectors with the lowest ids — no sampling state
  - assignment: nearest centroid by squared L2; ties break on the lower cell
    id via lexicographic struct ordering
  - update: centroid means accumulate as 1e-6-quantized int64 sums
    (order-independent, engine-exact) divided back to double

At 100 TB: assignment is a pure column expression (k*dims literals folded into
the plan — k is small for a coarse quantizer), the update is one
partial/final aggregation over (cell, dim); nothing here depends on collect()
over data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 1_000_000  # centroid-mean quantization


def _dist_expr(vec_col: str, centroid: list[float]) -> F.Column:
    """Squared L2 between the vector column and one centroid literal,
    left-associated accumulation (matches a sequential-loop twin exactly)."""
    lits = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in centroid)
    return F.expr(
        f"aggregate(zip_with({vec_col}, array({lits}), "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def assign_cells(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): nearest-centroid assignment as one pure-column expression —
    array_min over (dist, cell) structs; lexicographic struct order gives the
    deterministic lowest-cell tiebreak."""
    choices = F.array(
        *[
            F.struct(_dist_expr(vec_col, c).alias("dist"), F.lit(j).alias("cell"))
            for j, c in enumerate(centroids)
        ]
    )
    return embeddings.select(
        F.col(id_col),
        F.array_min(choices)["cell"].alias("cell"),
    )


def fit_kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's iterations; returns the learned centroids (k x dims doubles).

    Empty cells keep their previous centroid (no re-seeding randomness).
    """
    init_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()  # k MODEL rows, not data — the deterministic seed
    )
    centroids = [[float(v) for v in r[vec_col]] for r in init_rows]
    if len(centroids) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(centroids)}")

    for _ in range(iters):
        assigned = embeddings.select(
            F.col(id_col),
            F.col(vec_col),
        ).join(
            assign_cells(embeddings, centroids, id_col, vec_col), id_col
        )
        # update: explode to (cell, dim, value), one partial/final aggregation;
        # the driver receives k*dims scalars — the new model, nothing else
        stats = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.floor(F.col("v").cast("double") * Q).cast("bigint")).alias("qs"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty cells keep old
        dims: dict[int, dict[int, float]] = {}
        for r in stats:
            dims.setdefault(r["cell"], {})[r["pos"]] = (r["qs"] / Q) / r["n"]
        for cell, posvals in dims.items():
            for pos, val in posvals.items():
                new_centroids[cell][pos] = val
        if new_centroids == centroids:
            break
        centroids = new_centroids
    return centroids
