"""Epoch extraction that works on both TIMESTAMP and TIMESTAMP_NTZ.

The driver's parquet testdata carries naive ``timestamp[us]`` columns, which
Spark 4 infers as TIMESTAMP_NTZ — and the builtin ``unix_micros`` /
``unix_millis`` / ``unix_seconds`` accept only TIMESTAMP (LTZ), failing
analysis on NTZ input. ``timestampdiff`` against an NTZ epoch literal accepts
both types (Catalyst coerces the literal when the column is LTZ) and is
timezone-independent for NTZ input: naive wall-clock is measured against
naive 1970-01-01, exactly how DuckDB's ``epoch_us``/``epoch_ms`` treat naive
timestamps, so Spark and oracle agree byte-for-byte.

All epoch math in the repo routes through these helpers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _epoch() -> Column:
    # Built lazily: constructing the literal needs no SparkSession, but keep
    # the pattern uniform and cheap anyway.
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since the epoch; NTZ- and LTZ-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", _epoch(), c)


def epoch_millis(col: Column | str) -> Column:
    """Milliseconds since the epoch; NTZ- and LTZ-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MILLISECOND", _epoch(), c)


def epoch_seconds(col: Column | str) -> Column:
    """Whole seconds since the epoch; NTZ- and LTZ-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("SECOND", _epoch(), c)
