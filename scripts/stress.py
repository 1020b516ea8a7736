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

    # --- ANN hyperplane-LSH near-dup: dynamic planes + multiprobe + cap ---
    # Plant near-dup pairs (2i, 2i+1), twin = base + 0.15*noise (cosine ~0.989)
    # among centered pseudo-random noise vectors; measure wall time AND the
    # recall of the planted pairs — the evidence that cap-and-drop plus
    # multiprobe keeps recall while killing the in-bucket quadratic.
    n_planted = 500
    centered = "(CAST(pmod(hash(id * {salt} + i), 2001) AS DOUBLE) - 1000.0) / 1000.0"
    base = centered.format(salt=131)
    noise = centered.format(salt=977)
    planted_vec = F.expr(
        "transform(sequence(1, 64), i -> CAST("
        f"({base.replace('id', '(CAST(floor(id / 2) AS BIGINT))')})"
        f" + CAST(id % 2 AS DOUBLE) * 0.15 * ({noise}) AS FLOAT))"
    )
    planted = spark.range(2 * n_planted).select(F.col("id").alias("vec_id"), planted_vec.alias("embedding"))
    noise_vecs = spark.range(args.vecs - 2 * n_planted).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.expr(
            f"transform(sequence(1, 64), i -> CAST({base.replace('id', '(id + 1000000)')} AS FLOAT))"
        ).alias("embedding"),
    )
    corpus = planted.unionAll(noise_vecs)
    from hdfs2cass_spark.operators.hyperplane import derive_n_planes, hyperplane_near_dup_pairs

    t0 = time.perf_counter()
    pairs = hyperplane_near_dup_pairs(corpus, threshold=0.9, multiprobe=1)
    found_planted = pairs.filter(
        (F.col("id_a") % 2 == 0) & (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") < 2 * n_planted)
    ).count()
    dt = time.perf_counter() - t0
    recall = found_planted / n_planted
    out["ann_lsh_sec"] = round(dt, 2)
    out["ann_lsh_recall"] = round(recall, 3)
    out["ann_lsh_planes"] = derive_n_planes(args.vecs, multiprobe=1)
    print(f"# ann_lsh: {dt:.2f}s  recall {recall:.3f} on {n_planted} planted pairs", file=sys.stderr)

    # --- training-pipeline stages over the same synthetic docs ---
    # pack_sequences: the distributed prefix-sum must hold its shape when the
    # shard-offset table is thousands of rows (docs/64 shards); decontamination:
    # the broadcast bench-set join over ~docs x 28 shingles.
    from hdfs2cass_spark.plans.pipeline import decontamination_overlap, pack_sequences

    run("pack_sequences", pack_sequences(spark, tmp), args.docs)
    run("decontamination", decontamination_overlap(spark, tmp), args.docs)

    # the composed curation chain (quality -> dedup -> decontam -> pack) as
    # ONE job over the same synthetic docs — the end-to-end number a real
    # pipeline pays, not the per-stage sum
    from hdfs2cass_spark.plans.compose import curate_corpus

    run("curate_corpus", curate_corpus(spark, tmp), args.docs)

    out["docs"] = args.docs
    out["vecs"] = args.vecs
    out["rows"] = args.rows
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
