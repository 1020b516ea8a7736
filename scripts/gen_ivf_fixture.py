"""Generate the learned IVF coarse-quantizer fixture.

Fits deterministic k-means (operators/kmeans.py — lowest-id init, quantized
int64 means) on the sf0.01 embeddings ONCE and commits the centroids; the
`embedding_ivf_topk` query and its DuckDB oracle both inline these centroids
as literals, so cell assignment is engine-exact on every scale factor.
(Embeddings are NOT id-stable across scale factors, so a per-vector cell
fixture would be wrong — only the model is shared.)

Run from the repo root:  python scripts/gen_ivf_fixture.py
Output: fixtures/ivf_centroids.parquet  (cell: int, centroid: list<double>)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8
ITERS = 4
SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def main() -> int:
    from hdfs2cass_spark.operators.kmeans import fit_kmeans
    from hdfs2cass_spark.session import get_session
    from hdfs2cass_spark.sources.readers import load_table

    spark = get_session("gen-ivf-fixture")
    emb = load_table(spark, SF, "embeddings")
    cents = fit_kmeans(emb, k=K, iters=ITERS)
    pq.write_table(
        pa.table(
            {
                "cell": list(range(K)),
                "centroid": pa.array(cents, type=pa.list_(pa.float64())),
            }
        ),
        f"{OUT}/ivf_centroids.parquet",
    )
    print(f"ivf_centroids.parquet: {K} cells x {len(cents[0])} dims (iters={ITERS})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
