"""Skew handling: key salting for hot-key joins and aggregations.

AQE's skew-join splitting (enabled in session.py) handles most sort-merge skew
at runtime; salting is the explicit tool for the two cases AQE can't fix:
hot keys in a *hash aggregation* (one reducer owns the hot group) and hot keys
joining a *non-broadcastable* dimension.

Pattern: explode the hot side's key space by a salt in [0, n); replicate the
other side once per salt value; join/aggregate on (key, salt); fold the salt
back out. Cost: dimension side inflates n-fold — choose n ~ the skew factor,
not more.
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


def salted_count(df: DataFrame, key: str, n: int = 8) -> DataFrame:
    """Two-phase hot-key count: partial count on (key, salt), final on key.
    (groupBy already does map-side partials; this additionally splits a single
    hot key's *reduce* work across n tasks.)"""
    return (
        with_salt(df, n)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(key)
        .agg(F.sum("_c").alias("n_rows"))
    )
