"""SemDeDup identical-mass skew probe: a large exact-duplicate group must
NOT create a quadratic pair stage.

The adversarial shape a crawled corpus actually produces: ``--hot-frac`` of
``--vecs`` vectors are byte-identical (boilerplate pages / empty strings all
embedding to one point). The naive within-cell pairwise rule would evaluate
(hot_frac * vecs)^2 / 2 cosines on that group — 4.5e9 at the default shape —
but the exact-duplicate collapse (plans/semdedup.py) reduces the group to
ONE representative before the pair join, so the pair stage sees at most
(distinct vectors in the cell)^2 and the members are marked duplicates by
the collapse rule alone. The probe asserts:

  - wall time stays linear-ish in the corpus (no quadratic stage);
  - exactly the right vectors drop: every non-rep member of the hot group,
    plus whatever organic near-dups the random fill produces;
  - a planted all-zero group is NEVER dropped (cosine undefined).

Run:  python scripts/semdedup_skew_probe.py [--vecs 1000000] [--hot-frac 0.3]

Recorded result (local[32]): see ARCHITECTURE.md "SemDeDup at scale".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=200_000)
    ap.add_argument("--hot-frac", type=float, default=0.3)
    ap.add_argument("--dims", type=int, default=64)
    # k MUST scale with the corpus (SemDeDup's own contract: cells of
    # bounded size make the within-cell pairwise O(n * cell) not O(n^2));
    # default keeps ~800 vectors/cell. A fixed tiny k at probe scale would
    # measure the ORGANIC quadratic blowup the method exists to avoid, not
    # the hot-group collapse.
    ap.add_argument("--k", type=int, default=None)
    args = ap.parse_args()
    if args.k is None:
        args.k = max(8, args.vecs // 800)

    from pyspark.sql import functions as F

    from hdfs2cass_spark.plans.semdedup import semdedup_df
    from hdfs2cass_spark.session import get_session

    spark = get_session("semdedup-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    n, d = args.vecs, args.dims
    n_hot = int(n * args.hot_frac)
    n_zero = 1000
    # deterministic synthetic corpus, no numpy on the driver for the data
    # itself: ids [0, n_hot) share ONE vector; [n_hot, n_hot+n_zero) are
    # all-zero; the rest are hash-derived pseudo-random unit-ish vectors
    vec = F.expr(
        f"""CASE
          WHEN vec_id < {n_hot} THEN transform(sequence(1, {d}),
            i -> CAST(sin(CAST(i AS DOUBLE)) AS FLOAT))
          WHEN vec_id < {n_hot + n_zero} THEN transform(sequence(1, {d}),
            i -> CAST(0.0 AS FLOAT))
          ELSE transform(sequence(1, {d}),
            i -> CAST(pmod(hash(vec_id * 131 + i), 2000) / 1000.0 - 1.0 AS FLOAT))
        END"""
    )
    e = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))

    # fixed centroids (hash-derived, same recipe as the fill) — the probe
    # measures the PAIR stage, not the fit
    import math

    cents = [
        [math.sin(j * 977 + i) for i in range(d)] for j in range(args.k)
    ]

    out = semdedup_df(e, cents, tau=0.95)
    t0 = time.perf_counter()
    rows = out.filter(~F.col("is_kept")).count()
    kept_hot = out.filter((F.col("vec_id") < n_hot) & F.col("is_kept")).count()
    zero_dropped = out.filter(
        (F.col("vec_id") >= n_hot) & (F.col("vec_id") < n_hot + n_zero) & ~F.col("is_kept")
    ).count()
    dt = time.perf_counter() - t0
    naive_pairs = n_hot * (n_hot - 1) // 2
    print(
        f"vecs={n:,} hot={n_hot:,} (naive pair stage would be {naive_pairs:.2e} cosines)\n"
        f"dropped={rows:,} kept_in_hot_group={kept_hot} zero_group_dropped={zero_dropped}\n"
        f"wall={dt:.1f}s ({n / dt:,.0f} vecs/s)"
    )
    assert kept_hot == 1, "exactly the lowest-id rep of the hot group survives"
    assert zero_dropped == 0, "zero vectors are never duplicates"
    assert rows >= n_hot - 1, "all non-rep hot members dropped"
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
