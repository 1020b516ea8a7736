"""Presentation ordering for map-only declared queries.

Every declared query ends with a total-order ``orderBy`` (the driver's
value-hash compare is row-order-sensitive, so each query pins a unique-key
order). ``orderBy`` plans as a range exchange, and RangePartitioner derives
its bounds by SAMPLING the child plan — a full extra execution of it. When
the child contains a shuffle, the sampling pass reuses the shuffle files
and the extra cost is one cheap post-shuffle stage; when the child is
MAP-ONLY (the quality/tokenizer/fingerprint report family) the sampling
pass re-runs the ENTIRE computation: measured 36 s -> 19 s on the winnow
report at the 1M-doc stress shape, i.e. the naive form pays the whole
query twice.

``present_sorted`` inserts a hash repartition on the leading sort key
before the orderBy: the repartition is a reusable shuffle boundary, so the
sampling pass reads shuffle files instead of recomputing the map. The
extra shuffle moves only the query's OUTPUT rows (already reduced to
report grain), which is exactly what the orderBy was about to move anyway.

Only worth applying when the child is compute-heavy and unbarriered —
aggregate-tailed queries already end in an exchange the sampler reuses
(audited by scripts-free plan check: plan has `rangepartitioning` with no
Exchange/ShuffleQueryStage below it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def present_sorted(df: DataFrame, *cols: str) -> DataFrame:
    return df.repartition(cols[0]).orderBy(*cols)
