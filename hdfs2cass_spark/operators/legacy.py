"""Legacy tab-separated input format (P3-P5).

Format spec (/root/reference/src/main/java/com/spotify/hdfs2cass/LegacyInputFormat.java:26-38):

    HdfsToCassandra\\t1\\t<rowkey>\\t<colname>\\t<value>
    HdfsToCassandra\\t2\\t<rowkey>\\t<colname>\\t<timestamp>\\t<value>
    HdfsToCassandra\\t3\\t<rowkey>\\t<colname>\\t<timestamp>\\t<ttl>\\t<value>

Malformed rows (wrong prefix :72-73, wrong field count per version :77-92,
unknown version :97-98, non-numeric timestamp/ttl :123-129) raise at runtime in
the reference. Here: ``mode="strict"`` reproduces that via ``raise_error`` inside
the plan; ``mode="permissive"`` filters them out (the scale-friendly choice —
one bad row shouldn't kill a 100 TB job).

All pure Catalyst expressions (split/element_at/when) — no UDFs.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PREFIX = "HdfsToCassandra"


def _nfields_ok(n: Column, version: Column) -> Column:
    return (
        ((version == 1) & (n == 5))
        | ((version == 2) & (n == 6))
        | ((version == 3) & (n == 7))
    )


def parse_legacy_lines(
    df: DataFrame,
    line_col: str = "line",
    mode: str = "permissive",
    now_ms: int | None = None,
) -> DataFrame:
    """Parse legacy lines into (key, colname, timestamp, ttl, value).

    v1 rows get timestamp = now_ms — pin it for determinism in tests; when not
    supplied it defaults to the current wall clock, matching the reference's
    DateTimeUtils.currentTimeMillis stamp (LegacyHdfsToThrift.java). A 0
    default would write writetime=0 rows that any later write silently
    overwrites. ttl defaults to 0.
    """
    if mode not in ("strict", "permissive"):
        raise ValueError(f"mode must be strict|permissive, got {mode!r}")
    now = F.lit(now_ms if now_ms is not None else int(time.time() * 1000)).cast("long")

    parts = F.split(F.col(line_col), "\t")
    n = F.size(parts)
    # try_element_at / try_cast, not element_at / cast: under ANSI mode an
    # out-of-bounds index or non-numeric field would throw even in permissive
    # mode (both fuzz-caught — short lines and junk version fields)
    prefix = F.try_element_at(parts, F.lit(1))
    version = F.try_element_at(parts, F.lit(2)).try_cast("int")
    well_formed = (
        (prefix == PREFIX)
        & version.isNotNull()
        & _nfields_ok(n, version)
    )
    key = F.try_element_at(parts, F.lit(3))
    colname = F.try_element_at(parts, F.lit(4))
    ts_raw = F.when(version == 2, F.try_element_at(parts, F.lit(5))).when(
        version == 3, F.try_element_at(parts, F.lit(5))
    )
    ttl_raw = F.when(version == 3, F.try_element_at(parts, F.lit(6)))
    value = (
        F.when(version == 1, F.try_element_at(parts, F.lit(5)))
        .when(version == 2, F.try_element_at(parts, F.lit(6)))
        .when(version == 3, F.try_element_at(parts, F.lit(7)))
    )
    # try_cast: non-numeric -> NULL (then strict raises / permissive drops)
    ts = ts_raw.try_cast("long")
    ttl = ttl_raw.try_cast("int")
    numbers_ok = (ts_raw.isNull() | ts.isNotNull()) & (ttl_raw.isNull() | ttl.isNotNull())
    valid = well_formed & numbers_ok

    out = df.select(
        valid.alias("_valid"),
        F.col(line_col).alias("_line"),
        key.alias("key"),
        colname.alias("colname"),
        F.coalesce(ts, now).alias("timestamp"),
        F.coalesce(ttl, F.lit(0)).alias("ttl"),
        value.alias("value"),
    )
    if mode == "strict":
        guard = F.when(
            ~F.col("_valid"),
            F.raise_error(F.concat(F.lit("Failed to parse legacy row: "), F.col("_line"))),
        )
        out = out.withColumn("key", F.coalesce(guard.cast("string"), F.col("key")))
    else:
        out = out.filter(F.col("_valid"))
    return out.drop("_valid", "_line")


def format_legacy_lines(
    df: DataFrame,
    key: str,
    colname: str,
    value: str,
    timestamp: str | None = None,
    ttl: str | None = None,
) -> DataFrame:
    """Inverse of the parser: build legacy lines from columns (v1/v2/v3 chosen
    by which optional fields are supplied). Used by tests and the round-trip
    oracle query."""
    cols = [F.lit(PREFIX)]
    if ttl is not None:
        if timestamp is None:
            raise ValueError("v3 lines require timestamp")
        cols += [F.lit("3"), F.col(key), F.col(colname), F.col(timestamp), F.col(ttl)]
    elif timestamp is not None:
        cols += [F.lit("2"), F.col(key), F.col(colname), F.col(timestamp)]
    else:
        cols += [F.lit("1"), F.col(key), F.col(colname)]
    cols.append(F.col(value))
    return df.select(F.concat_ws("\t", *[c.cast("string") for c in cols]).alias("line"))


def legacy_to_cql(parsed: DataFrame) -> DataFrame:
    """P4 LegacyHdfsToCQL (LegacyHdfsToCQL.java:31-51): parsed legacy rows ->
    CQL insert shape (_rowkey + colname/value as the bound values + writetime
    + ttl).

    The parsed ms timestamp is bound VERBATIM as the USING TIMESTAMP value —
    the reference passes it unchanged into CQLRecord.create
    (LegacyHdfsToCQL.java:44-49); scaling it to µs here would make these rows
    win conflict resolution against reference-loaded data by 1000x.
    """
    return parsed.select(
        F.col("key").alias("_rowkey"),
        "key",
        "colname",
        "value",
        F.col("timestamp").alias("writetime"),
        F.col("ttl").cast("int").alias("ttl"),
    )


def legacy_to_thrift(parsed: DataFrame) -> DataFrame:
    """P5 LegacyHdfsToThrift (LegacyHdfsToThrift.java:34-54): one Mutation per
    parsed line (ms timestamps)."""
    return parsed.select(
        F.col("key"),
        F.array(
            F.struct(
                F.col("colname").alias("name"),
                F.col("value").alias("value"),
                F.col("timestamp").alias("ts"),
                F.col("ttl").cast("int").alias("ttl"),
            )
        ).alias("mutations"),
    )
