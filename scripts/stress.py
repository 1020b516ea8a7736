"""Scale stress run: the three hot paths at ~40x the sf0.1 fixture volume.

    python scripts/stress.py [--docs 200000] [--vecs 200000] [--rows 5000000]

Generates deterministic synthetic data (seeded, no fixture dependency), runs:
  - bulk routing: typed-key token shuffle + in-partition sort (the reference
    dataflow) over --rows rows
  - near-dup dedup: shingle -> xxhash64 minhash -> banded LSH -> capped
    in-bucket pair expansion over --docs documents
  - ANN: brute-force cosine top-5 for 5 queries over --vecs 64-dim vectors

Prints ONE JSON line with rows/s per path. This is evidence the shapes hold
past the fixture scale — partition counts, memory, and skew behavior at 40x,
not correctness (the oracle gate covers that at sf0.01).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--vecs", type=int, default=200_000)
    ap.add_argument("--rows", type=int, default=5_000_000)
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from hdfs2cass_spark.session import get_session
    from hdfs2cass_spark.sinks.pipeline import bulk_load

    spark = get_session("stress")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    def run(label, df, n_rows):
        df.write.mode("overwrite").format("noop").save()  # warm plan + JIT
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        out[label + "_sec"] = round(dt, 2)
        out[label + "_rows_per_sec"] = round(n_rows / dt)
        print(f"# {label}: {dt:.2f}s  ({n_rows / dt:,.0f} rows/s)", file=sys.stderr)

    # --- bulk routing (typed bigint key) ---
    rows = spark.range(args.rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).alias("v1"),
        F.concat(F.lit("payload-"), F.col("id")).alias("v2"),
    )
    routed = bulk_load(rows, "cql://h/ks/stress?reducers=32", rowkey="k", now_ms=42)
    run("bulk_route", routed, args.rows)

    # --- near-dup dedup (xxhash64 production twin) ---
    # ~30-word docs from a small vocabulary; ~1% near-dup pairs by seeded id
    words = F.expr(
        "transform(sequence(1, 30), i -> "
        "concat('w', pmod(hash(id * 31 + i), 500)))"
    )
    docs = spark.range(args.docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )
    tmp = "/tmp/stress_dir"
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from hdfs2cass_spark.plans.llm import minhash_lsh_pairs_fast

    pairs = minhash_lsh_pairs_fast(spark, tmp)
    run("minhash_lsh", pairs, args.docs)

    # --- ANN brute-force cosine top-5 (5 queries x vecs) ---
    vec = F.expr(
        "transform(sequence(1, 64), i -> "
        "CAST(pmod(hash(id * 131 + i), 1000) AS FLOAT) / 1000.0)"
    )
    emb = spark.range(args.vecs).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    emb.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    from hdfs2cass_spark.plans.llm import embedding_topk_cosine

    topk = embedding_topk_cosine(spark, tmp)
    run("ann_bruteforce", topk, args.vecs)

    out["docs"] = args.docs
    out["vecs"] = args.vecs
    out["rows"] = args.rows
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
