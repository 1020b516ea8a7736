"""Join-side sizing helpers.

An explicit ``broadcast()`` hint bypasses Spark's
``spark.sql.autoBroadcastJoinThreshold`` size check entirely: the hinted side
is collected to the driver and replicated to every executor no matter how
large it turns out to be.  That is the right call for fixed-cardinality
dimensions (nation = 25 rows, region = 5 rows at every TPC-H scale factor)
and wrong for anything that grows with the data (customer = 150k rows x SF,
supplier = 10k rows x SF): at sf100 a hinted customer side is multiple GB and
OOMs the driver/executors.

``size_guarded_broadcast`` keeps the plan-time hint only when the optimizer's
own size estimate for the side fits under a cap; otherwise it returns the
DataFrame unhinted so AQE picks broadcast vs shuffle join from the TRUE
runtime size of the side (``spark.sql.adaptive.enabled`` converts sort-merge
joins to broadcast at runtime when a side materializes small).  Either way the
decision is made from measured size, never from a hardcoded hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast

_UNITS = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
}


def parse_byte_conf(value: str | int) -> int:
    """Parse Spark byte-string conf values ("10485760", "10485760b", "10m")."""
    if isinstance(value, int):
        return value
    s = value.strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, unit = s[:i], s[i:].strip()
    if not num:
        raise ValueError(f"unparseable byte conf: {value!r}")
    return int(num) * _UNITS.get(unit, 1)


def plan_size_estimate(df: DataFrame) -> int:
    """The optimizer's sizeInBytes estimate for df's optimized logical plan.

    For parquet-backed relations this derives from real file sizes (with
    partition pruning and column stats folded in where available); without
    CBO, filters conservatively inherit the child estimate — which is the
    safe direction for a broadcast guard (over-estimate -> no hint -> AQE
    decides from runtime truth).
    """
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def size_guarded_broadcast(df: DataFrame, cap_bytes: int | None = None) -> DataFrame:
    """Attach a broadcast hint only if the plan-time size estimate fits.

    cap_bytes defaults to the session's spark.sql.autoBroadcastJoinThreshold
    (so the explicit hint never promises more than the planner itself would);
    a non-positive threshold (broadcast disabled) always returns df unhinted.
    """
    if cap_bytes is None:
        spark = df.sparkSession
        cap_bytes = parse_byte_conf(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        )
    if cap_bytes <= 0:
        return df
    return broadcast(df) if plan_size_estimate(df) <= cap_bytes else df
