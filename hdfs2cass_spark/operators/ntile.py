"""Exact NTILE without a corpus-sized window — the histogram-rank scheme.

``NTILE(n) OVER (PARTITION BY p ORDER BY v DESC, tie)`` is one SQL line,
but Spark executes it as a per-partition SORT of every row in one task per
partition key — the single-task-window anti-pattern when a partition is a
whole language/corpus. This operator computes the IDENTICAL buckets from
bounded windows:

  1. histogram: count rows per (partition, value) — the distinct-value
     table, map-side combined;
  2. a cumulative window over the HISTOGRAM gives each value its
     "rows-strictly-before-me" offset and the partition total;
  3. each row's exact rank = offset + its row_number among equal-value
     peers (a (partition, value)-partitioned window — bounded by tie
     counts);
  4. the NTILE bucket is closed-form arithmetic on (rank, total): with
     q = total DIV n and rem = total %% n, the first ``rem`` buckets hold
     q+1 rows — rank r maps to ceil(r / (q+1)) inside the first
     (q+1)*rem ranks, else rem + ceil((r - (q+1)*rem) / q). Bit-identical
     to NTILE's ceil/floor split under the same deterministic order.

CONTRACT, stated plainly: ``order_col`` must be bounded-cardinality — the
histogram window is one task per partition over the DISTINCT-VALUE table,
so this wins exactly when values are quantized (rounded scores, day
counts, integer frequencies, money). For a genuinely continuous metric,
quantize first (the house recipe everywhere else) — an unquantized
uniform-random double degrades the histogram to row grain and with it this
scheme to the naive window.

First consumer: plans/refppl.py's per-language perplexity terciles;
plans/rfm.py's RFM quintiles reuse it across three dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_ntile(
    df: DataFrame,
    n: int,
    order_col: str,
    tiebreak_col: str,
    part_cols: list[str] | None = None,
    desc: bool = True,
    out_col: str = "bucket",
) -> DataFrame:
    """Adds ``out_col`` = NTILE(``n``) over (PARTITION BY ``part_cols``
    ORDER BY ``order_col`` [DESC], ``tiebreak_col``). ``tiebreak_col``
    must make the ordering unique within each partition (ranks — and with
    them buckets — are then deterministic and engine-exact).

    ``order_col`` must be NON-NULL: NULL ordering semantics (NULLS
    FIRST/LAST defaults) differ across engines, so a NULL score has no
    engine-exact rank. Both shipped consumers guarantee this by
    construction (refppl scores every grouped doc; RFM metrics coalesce).
    NULL PARTITION values are handled: the histogram join-back is
    null-SAFE (`<=>`), so a NULL-partition group buckets on its own —
    exactly NTILE's PARTITION BY semantics — instead of vanishing through
    a never-matching equi-join (review finding)."""
    part = list(part_cols or [])
    key = F.col(order_col).desc() if desc else F.col(order_col).asc()
    hist = df.groupBy(*part, order_col).agg(F.count(F.lit(1)).alias("_c"))
    hw = (
        Window.partitionBy(*part)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.select(
        *[F.col(c).alias(f"_h_{c}") for c in part],
        F.col(order_col).alias(f"_h_{order_col}"),
        F.coalesce(F.sum("_c").over(hw), F.lit(0)).alias("_before"),
        F.sum("_c").over(Window.partitionBy(*part)).alias("_n"),
    )
    cond = None
    for c in part + [order_col]:
        piece = df[c].eqNullSafe(hist[f"_h_{c}"])
        cond = piece if cond is None else (cond & piece)
    peers = Window.partitionBy(*part, order_col).orderBy(tiebreak_col)
    ranked = (
        df.join(hist, cond)
        .drop(*[f"_h_{c}" for c in part + [order_col]])
        .withColumn("_r", F.col("_before") + F.row_number().over(peers))
    )
    # greatest(q, 1) keeps the (lazily unevaluated, but ANSI-mode-eager-
    # checked) else-branch division total when q = 0 — unreachable there
    # because r <= total = rem always takes the first branch
    q = "(_n DIV {n})".format(n=n)
    rem = "(_n % {n})".format(n=n)
    bucket = F.expr(
        f"CASE WHEN _r <= ({q} + 1) * {rem} "
        f"THEN (_r + {q}) DIV ({q} + 1) "
        f"ELSE {rem} + (_r - ({q} + 1) * {rem} + greatest({q}, 1) - 1) "
        f"DIV greatest({q}, 1) END"
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "_before", "_n", "_r"
    )
