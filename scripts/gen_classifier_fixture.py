"""Generate the learned quality-classifier weights fixture.

Fits the deterministic distributed logistic regression
(operators/classifier.py — all-zeros init, quantized int64 gradient sums)
ONCE on the sf0.01 documents, with the Gopher rule verdict
(plans/quality.py gopher_quality_filter `keep`) as the weak label — the
CCNet teacher-distillation recipe — over the md5 hashed-BoW embedding
(operators/embed.py hash_mode='md5', the oracle-reproducible featurizer).
The `quality_classifier_score` query and its DuckDB oracle both inline
these weights as literals, so the margin is engine-exact on every scale
factor. (Doc ids are NOT stable across scale factors — only the model is
shared, the gen_ivf_fixture.py argument.)

Run from the repo root:  python scripts/gen_classifier_fixture.py
Output: fixtures/quality_logreg.parquet  (weights: list<double>, bias: double)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = 64
ITERS = 16
LR = 2.0
SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def main() -> int:
    from pyspark.sql import SparkSession

    from hdfs2cass_spark.operators.classifier import fit_logreg
    from hdfs2cass_spark.plans.quality import gopher_quality_filter
    from hdfs2cass_spark.plans.quality_clf import _FDIMS, _features_spark
    from hdfs2cass_spark.sources.readers import load_table

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    docs = load_table(spark, SF, "documents")
    labels = gopher_quality_filter(spark, SF).select("doc_id", "keep")
    # two models, one per featurizer hash: md5 (the DuckDB-reproducible
    # oracle twin) and xxhash64 (the production featurizer — the stress
    # lane's quality_classifier_score_fast twin, round 12). Same recipe,
    # same labels; only the hashed-BoW bucket identities differ.
    for hash_mode, fname in (
        ("md5", "quality_logreg.parquet"),
        ("xxhash64", "quality_logreg_xxh.parquet"),
    ):
        feats = _features_spark(docs, hash_mode)
        train = feats.join(labels, "doc_id")
        w, b = fit_logreg(train, "keep", "features", _FDIMS, iters=ITERS, lr=LR)
        pq.write_table(
            pa.table({"weights": [w], "bias": [b]}),
            os.path.join(OUT, fname),
        )
        print(f"{hash_mode}: bias={b!r}")
        print(f"{hash_mode}: weights[:4]={w[:4]!r}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
