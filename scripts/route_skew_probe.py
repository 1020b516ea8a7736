"""Routed-sink skew probe (r12 verdict item 6).

`route_to_buckets` is the reference's heart (G1-G3): rows shuffle to the
token-range bucket owning their Cassandra partition key. At 100 TB a
zipf-hot partition key concentrates its entire mass in ONE bucket — that is
not a bug but the sink contract (all rows of a partition key MUST land in
one SSTable range), so the mitigation surface is the reference's own escape
hatch: `distributerandomly` (CassandraPartitioner.java:58-60 — round-robin
partitioning, no token routing), for jobs that accept giving up
token-sorted-per-bucket locality (the streaming loader then re-sorts) in
exchange for bounded task skew.

This probe drives BOTH modes of the real routing path over zipf keys and
emits the decision the escape hatch exists for:

  1. synthesizes N rows whose partition keys follow a zipf(s) law
     (rank-r key has mass ~ r^-s; s=1.2 default — a realistically hot
     power-law, the top key holding several percent of all rows)
  2. routes via route_to_buckets (token mode) and measures per-bucket and
     per-task row counts + wall time
  3. routes via distribute_randomly=True and measures the same
  4. applies the rule the probe exists to demonstrate: if token-mode
     max-task/mean-task imbalance exceeds --imbalance-threshold (default 4),
     the probe CHOOSES distributerandomly and says so in the output JSON

tests/test_partitioning.py::test_distribute_randomly_bounds_skew pins the
escape hatch's bound (max/mean <= 1.3 under an extreme hot key) so the
mitigation cannot silently regress.

    python scripts/route_skew_probe.py [--rows 2000000] [--keys 100000]
        [--zipf-s 1.2] [--buckets 32] [--imbalance-threshold 4.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zipf_keys(spark, rows: int, keys: int, s: float):
    """(key string) DataFrame with zipf(s) key frequencies, generated
    distributed: row i maps to the smallest rank r whose cumulative zipf
    mass covers i/rows — inverse-CDF over a broadcast boundary array, pure
    Catalyst (no Python in the data path)."""
    import numpy as np
    from pyspark.sql import functions as F

    ranks = np.arange(1, keys + 1, dtype=np.float64)
    w = ranks**-s
    cdf = np.cumsum(w) / w.sum()
    # bounds[r] = first row index PAST rank r+1; rank(i) = searchsorted —
    # an Arrow-batched pandas UDF over row ids with the boundary array in
    # the closure (vectorized, one hop, same shape as the token UDF itself;
    # a Catalyst array+filter search would be O(keys) per row)
    bounds = np.floor(cdf * rows).astype(np.int64)
    import pandas as pd
    from pyspark.sql.types import LongType

    def _rank(ids):
        return pd.Series(np.searchsorted(bounds, ids.to_numpy(), side="right"))

    # explicit annotations: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's signature inference rejects
    _rank.__annotations__ = {"ids": pd.Series, "return": pd.Series}
    rank_of = F.pandas_udf(_rank, LongType())

    return spark.range(rows).select(
        F.concat(F.lit("user"), rank_of(F.col("id")).cast("string")).alias("key")
    )


def measure(df, num_partitions: int) -> dict:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    agg = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    wall = time.perf_counter() - t0
    sizes = sorted((int(r["count"]) for r in agg), reverse=True)
    total = sum(sizes)
    mean = total / max(1, num_partitions)
    return {
        "wall_sec": round(wall, 3),
        "tasks_nonempty": len(sizes),
        "rows": total,
        "max_task_rows": sizes[0],
        "mean_task_rows": round(mean, 1),
        "max_over_mean": round(sizes[0] / mean, 3),
        "top5_task_rows": sizes[:5],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--zipf-s", type=float, default=1.2)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--imbalance-threshold", type=float, default=4.0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hdfs2cass_spark.operators.partitioning import route_to_buckets
    from hdfs2cass_spark.session import get_session

    spark = get_session("route-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    df = zipf_keys(spark, args.rows, args.keys, args.zipf_s)
    df = df.withColumn("payload", F.sha2(F.col("key"), 256))

    routed = route_to_buckets(df, args.buckets, "key")
    routed.write.mode("overwrite").format("noop").save()  # warm
    token_stats = measure(routed, args.buckets)
    # per-BUCKET sizes (several buckets can hash-share one task; the bucket
    # grain is what the SSTable writer sees)
    bucket_sizes = sorted(
        (
            int(r["count"])
            for r in routed.groupBy("bucket").count().collect()
        ),
        reverse=True,
    )
    token_stats["max_bucket_rows"] = bucket_sizes[0]
    token_stats["mean_bucket_rows"] = round(
        sum(bucket_sizes) / max(1, args.buckets), 1
    )
    token_stats["max_bucket_over_mean"] = round(
        bucket_sizes[0] / (sum(bucket_sizes) / max(1, args.buckets)), 3
    )

    rand = route_to_buckets(df, args.buckets, "key", distribute_randomly=True)
    rand.write.mode("overwrite").format("noop").save()  # warm
    random_stats = measure(rand, args.buckets)

    chosen = (
        "distributerandomly"
        if token_stats["max_over_mean"] > args.imbalance_threshold
        else "token-routing"
    )
    out = {
        "rows": args.rows,
        "distinct_keys": args.keys,
        "zipf_s": args.zipf_s,
        "buckets": args.buckets,
        "imbalance_threshold": args.imbalance_threshold,
        "token_routing": token_stats,
        "distribute_randomly": random_stats,
        "chosen": chosen,
        "note": (
            "token routing must keep a partition key inside one bucket, so a "
            "zipf-hot key IS its bucket's floor; distributerandomly "
            "(CassandraPartitioner.java:58-60 parity) bounds task skew at "
            "the cost of token-sorted-per-bucket locality"
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
