"""Winnow pair-stage skew probe: a boilerplate passage planted in a large
fraction of the corpus must NOT create a quadratic pair stage or an
unbounded aggregation buffer.

The adversarial shape: one 11-word passage (>= SUBSTR_K + WINNOW_W - 1, so
winnowing GUARANTEES every carrier selects a shared fingerprint) appears
in ``--hot-frac`` of ``--docs`` documents. Naive pair expansion on that
fingerprint's bucket is (hot_frac * docs)^2 / 2 pairs — 4.5e9 at the
default shape. The capped-bucket gate (operators/buckets.py: streaming
window COUNT before any collect_list) must DROP the bucket instead:
bounded memory, wall time linear in the corpus, and the planted pairs
absent from the output while organic pairs survive.

Run:  python scripts/winnow_skew_probe.py [--docs 1000000] [--hot-frac 0.3]

Recorded result (local[32], 1M docs, hot-frac 0.3 — 300k carriers):
see ARCHITECTURE.md "Winnowing at scale".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hdfs2cass_spark.operators.buckets import capped_buckets
    from hdfs2cass_spark.plans.winnow import PAIR_CAP, winnow_fingerprints_df
    from hdfs2cass_spark.session import get_session

    spark = get_session("winnow-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    hot = " ".join(f"boiler{i}" for i in range(11))  # guaranteed-shared span
    words = F.expr(
        "transform(sequence(1, 30), i -> concat('w', pmod(hash(doc_id * 31 + i), 500)))"
    )
    d = (
        spark.range(args.docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.when(
                F.pmod(F.col("doc_id"), F.lit(int(1 / args.hot_frac))) == 0,
                F.concat(F.lit(hot + " "), F.concat_ws(" ", words)),
            )
            .otherwise(F.concat_ws(" ", words))
            .alias("text"),
        )
    )

    # the pair stage exactly as winnow_candidate_pairs plans it (fast grams:
    # the probe targets the bucket gate, not the oracle hash)
    fp = winnow_fingerprints_df(d, fast=True).select("doc_id", "h").distinct()
    t0 = time.perf_counter()
    buckets = capped_buckets(fp, ["h"], "doc_id", cap=PAIR_CAP)
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
        "struct(x AS doc_a, y AS doc_b))))"
    )
    pairs = (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    n_hot = args.docs // int(1 / args.hot_frac)
    naive = n_hot * (n_hot - 1) // 2
    print(
        f"docs={args.docs:,} hot_carriers={n_hot:,} naive_hot_pairs={naive:,.0f}\n"
        f"pair stage: {dt:.1f}s, emitted pairs={n_pairs:,} "
        f"(hot bucket DROPPED by the {PAIR_CAP}-cap gate; a quadratic stage "
        f"would have needed {naive:,.0f} pair rows)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
