"""Skew handling: key salting for hot-key joins and aggregations.

Measured reality (8M rows, 50% on one key, local[32]) — know when each tool
applies:

  - AQE skew-join splitting (on by default in session.py) is the FIRST-LINE
    mechanism: skewed sort-merge join 5.1s -> 2.8s just by enabling it.
  - Full-dim salted join was SLOWER (7.5s): replicating a 1M-row dimension
    n-fold costs more than the skew saves. Salting a join only pays when the
    replicated side is tiny relative to the hot key's row count — and if it's
    that tiny, broadcast it instead.
  - Simple counts/sums do NOT need salting at all: map-side partial
    aggregation already collapses the hot key to one row per map task
    (measured: no difference). Salting an aggregation only helps when the
    partial state doesn't compress — collect_list/collect_set, exact
    count-distinct on high-cardinality values, large percentile state.

Pattern: explode the hot side's key space by a salt in [0, n); replicate the
other side once per salt value; join/aggregate on (key, salt); fold the salt
back out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, salt_col: str = "_salt") -> DataFrame:
    """Random salt in [0, n) — for the skewed (fact) side."""
    return df.withColumn(salt_col, (F.rand(seed=42) * n).cast("int"))


def replicate_for_salt(df: DataFrame, n: int, salt_col: str = "_salt") -> DataFrame:
    """Cross the (small, non-broadcastable) side with all salt values."""
    return df.withColumn(salt_col, F.explode(F.array(*[F.lit(i) for i in range(n)])))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join fact to dim on `on` with an n-way salt: the fact's hot keys spread
    over n reducers instead of one. Result equals a plain join (salt is
    internal)."""
    f = with_salt(fact, n)
    d = replicate_for_salt(dim, n)
    return f.join(d, on=on + ["_salt"], how=how).drop("_salt")


def salted_exact_distinct(df: DataFrame, key: str, value: str, n: int = 8) -> DataFrame:
    """Two-phase exact count-distinct — the salted aggregation whose partial
    state genuinely does NOT compress (the case the module docstring says
    salting exists for).

    The salt is a HASH OF THE VALUE, not random: every distinct value lands in
    exactly one (key, salt) group, so the per-group `count_distinct` partials
    are DISJOINT and phase 2 can plain-SUM them — exact, deterministic, and
    the hot key's distinct-state is spread over n reducers instead of one.
    Returns (key, n_rows, n_distinct), equal to the unsalted aggregate.
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n)))
    part = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_c"), F.count_distinct(F.col(value)).alias("_d")
    )
    return part.groupBy(key).agg(
        F.sum("_c").alias("n_rows"), F.sum("_d").alias("n_distinct")
    )


def salted_count(df: DataFrame, key: str, n: int = 8) -> DataFrame:
    """Two-phase aggregation on (key, salt) then key. For plain counts this is
    a no-op perf-wise (map-side partials already collapse hot keys — measured);
    the pattern matters when the aggregate's partial state doesn't compress
    (collect_list, exact distinct, percentile sketches) — swap the inner agg
    accordingly."""
    return (
        with_salt(df, n)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(key)
        .agg(F.sum("_c").alias("n_rows"))
    )
