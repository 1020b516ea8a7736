"""Record reshaping: flat rows -> Cassandra insert form.

Re-expresses the reference's map-phase operators as pure Catalyst column
expressions (no UDFs — whole-stage codegen keeps this JVM-side):

  P1 AvroToCQL   (/root/reference/src/main/java/com/spotify/hdfs2cass/cassandra/cql/AvroToCQL.java:35-101)
  P2 AvroToThrift (/root/reference/.../cassandra/thrift/AvroToThrift.java:41-109)
  P6 ThriftByFieldNamesFn / Thrift.byConvention (/root/reference/.../crunch/thrift/ThriftByFieldNamesFn.java:37-142,
     Thrift.java:22-52)

Semantics preserved:
  - rowkey defaults to the field literally named "rowkey", else field 0
    (Hdfs2Cass.java:50-51, AvroToCQL.java:43)
  - `ignore` drops columns (a projection); timestamp/ttl source fields are
    consumed (not emitted as values)
  - missing/null timestamp -> "now" (µs for CQL, AvroToCQL.java:63; ms for
    Thrift, AvroToThrift.java:69); missing/null ttl -> 0
  - field resolution is by NAME from the schema: the reference resolves
    positions lazily from the first record (AvroToCQL.java:86-100); in Spark the
    schema is known at plan time so resolution happens eagerly — same contract,
    earlier errors.

Determinism: pass `now_ms` (fixed clock) for reproducible writetime — the
reference's tests pin the clock the same way
(LegacyInputFormatTest.java: DateTimeUtils.setCurrentMillisFixed).
"""

from __future__ import annotations

import time
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _resolve_rowkey(columns: list[str], rowkey: str | None) -> str:
    if rowkey is not None:
        if rowkey not in columns:
            raise ValueError(f"rowkey column {rowkey!r} not in {columns}")
        return rowkey
    return "rowkey" if "rowkey" in columns else columns[0]


def resolve_rowkey(columns: list[str], rowkey: str | None) -> str:
    """Public rowkey resolution (Hdfs2Cass.java:50-51): explicit flag, else the
    field literally named 'rowkey', else field 0."""
    return _resolve_rowkey(columns, rowkey)


def _value_columns(
    columns: list[str],
    timestamp: str | None,
    ttl: str | None,
    ignore: Sequence[str],
) -> list[str]:
    drop = set(ignore) | {c for c in (timestamp, ttl) if c}
    missing = drop - set(columns)
    if missing:
        raise ValueError(f"columns not in schema: {sorted(missing)}")
    return [c for c in columns if c not in drop]


def _ts_col(df: DataFrame, timestamp: str | None, now: int) -> Column:
    # explicit field, null-safe fallback to fixed "now" (AvroToCQL.java:73-76).
    # The literal must be cast: a small fixed clock would otherwise type the
    # writetime column as int and the output schema would depend on the value.
    if timestamp is not None:
        return F.coalesce(F.col(timestamp).cast("long"), F.lit(now).cast("long"))
    return F.lit(now).cast("long")


def _ttl_col(df: DataFrame, ttl: str | None) -> Column:
    if ttl is not None:
        return F.coalesce(F.col(ttl).cast("int"), F.lit(0))
    return F.lit(0)


def reshape_cql(
    df: DataFrame,
    rowkey: str | None = None,
    timestamp: str | None = None,
    ttl: str | None = None,
    ignore: Sequence[str] = (),
    now_ms: int | None = None,
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """P1: CQL insert form — value columns in schema order (rowkey included,
    like the CQL INSERT column list) + writetime (µs) + ttl (s).

    Types stay native; wire encoding happens at the sink boundary.
    The rowkey column is additionally surfaced as `_rowkey` (string) for key
    extraction without re-deriving the spec downstream. `passthrough` columns
    (e.g. a precomputed `_pk` binary key) are excluded from the value list and
    appended verbatim at the end.
    """
    now_us = (now_ms if now_ms is not None else int(time.time() * 1000)) * 1000
    rk = _resolve_rowkey(df.columns, rowkey)
    values = _value_columns(df.columns, timestamp, ttl, tuple(ignore) + tuple(passthrough))
    return df.select(
        F.col(rk).cast("string").alias("_rowkey"),
        *[F.col(c) for c in values],
        _ts_col(df, timestamp, now_us).alias("writetime"),
        _ttl_col(df, ttl).alias("ttl"),
        *[F.col(c) for c in passthrough],
    )


def cql_record_from_map(
    df: DataFrame,
    target_columns: Sequence[str],
    rowkey: str | None = None,
    timestamp: str | None = None,
    ttl: str | None = None,
    now_ms: int | None = None,
) -> DataFrame:
    """The library-embedding constructor: values keyed by column NAME,
    resolved to the TARGET table's column order — `CQLRecord.create(conf,
    valueMap)` (CQLRecord.java:68-81, positions via
    CrunchCqlBulkOutputFormat.getColumnIndex, CrunchCqlBulkOutputFormat.java:
    93-99). A user's DataFrame columns may arrive in any order and with
    extras; the emitted value list follows ``target_columns`` (the prepared
    INSERT's column list, fetched from the cluster in the reference /
    supplied via TargetInfo here) exactly. Missing target columns raise at
    plan time — the reference throws per-record at write time
    (CrunchRuntimeException), Spark can fail earlier and say which.

    Output schema matches reshape_cql: _rowkey + target columns in target
    order + writetime (us) + ttl (s).
    """
    missing = [c for c in target_columns if c not in df.columns]
    if missing:
        raise ValueError(
            f"input is missing target columns {missing}; have {df.columns}"
        )
    rk = _resolve_rowkey(list(target_columns), rowkey)
    now_us = (now_ms if now_ms is not None else int(time.time() * 1000)) * 1000
    return df.select(
        F.col(rk).cast("string").alias("_rowkey"),
        *[F.col(c) for c in target_columns],
        _ts_col(df, timestamp, now_us).alias("writetime"),
        _ttl_col(df, ttl).alias("ttl"),
    )


def reshape_thrift(
    df: DataFrame,
    rowkey: str | None = None,
    timestamp: str | None = None,
    ttl: str | None = None,
    ignore: Sequence[str] = (),
    now_ms: int | None = None,
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """P2/P6: Thrift mutation form — (key, mutations: array<struct<name,value,ts,ttl>>).

    Unpivots each wide row into one Mutation per non-special column
    (AvroToThrift.java:81-89). Values are cast to string at this logical layer;
    the sink encodes wire bytes. Thrift timestamps are MILLIseconds
    (AvroToThrift.java:69) — a deliberate ms-vs-µs asymmetry with CQL.
    `passthrough` columns are excluded from the mutation list and appended
    verbatim at the end.
    """
    now = now_ms if now_ms is not None else int(time.time() * 1000)
    rk = _resolve_rowkey(df.columns, rowkey)
    values = [
        c
        for c in _value_columns(df.columns, timestamp, ttl, tuple(ignore) + tuple(passthrough))
        if c != rk
    ]
    ts = _ts_col(df, timestamp, now)
    ttlc = _ttl_col(df, ttl)
    mutations = F.array(
        *[
            F.struct(
                F.lit(c).alias("name"),
                F.col(c).cast("string").alias("value"),
                ts.alias("ts"),
                ttlc.alias("ttl"),
            )
            for c in values
        ]
    )
    return df.select(
        F.col(rk).cast("string").alias("key"),
        mutations.alias("mutations"),
        *[F.col(c) for c in passthrough],
    )


def reshape_thrift_counters(
    df: DataFrame,
    rowkey: str | None = None,
    ignore: Sequence[str] = (),
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """W2 counter path: (key, mutations: array<struct<name, delta: long>>).

    Counter mutations carry NO timestamp or ttl — Cassandra's counter write
    path assigns them (CrunchBulkRecordWriter.java:188-190 calls
    addCounterColumn(name, value) only). Deltas must be pre-aggregated
    per (key, column) upstream — exactly what the reference expects of its
    input and what `counter_column_updates` (plans/catalog.py) demonstrates;
    every non-key numeric column becomes one counter delta.
    """
    rk = _resolve_rowkey(df.columns, rowkey)
    values = [
        c
        for c in _value_columns(df.columns, None, None, tuple(ignore) + tuple(passthrough))
        if c != rk
    ]
    mutations = F.array(
        *[
            F.struct(
                F.lit(c).alias("name"),
                F.col(c).cast("long").alias("delta"),
            )
            for c in values
        ]
    )
    return df.select(
        F.col(rk).cast("string").alias("key"),
        mutations.alias("mutations"),
        *[F.col(c) for c in passthrough],
    )


def reshape_thrift_super(
    df: DataFrame,
    rowkey: str | None = None,
    super_col: str | None = None,
    timestamp: str | None = None,
    ttl: str | None = None,
    ignore: Sequence[str] = (),
    now_ms: int | None = None,
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """W2 super-column path: (key, mutations: array<struct<super,
    columns: array<struct<name,value,ts,ttl>>>>).

    Each input row becomes ONE Mutation carrying a SuperColumn named by
    `super_col`'s VALUE, holding one subcolumn per remaining field — the shape
    the reference's writer consumes with newSuperColumn + addColumn /
    addExpiringColumn per subcolumn (CrunchBulkRecordWriter.java:174-186).
    Super column families are deprecated in the reference's own Cassandra
    version; this models the write-path semantics so sorted-input grouping
    (same rowkey, consecutive super columns) is preserved end to end.
    """
    now = now_ms if now_ms is not None else int(time.time() * 1000)
    rk = _resolve_rowkey(df.columns, rowkey)
    if super_col is None or super_col not in df.columns:
        raise ValueError(f"super_col {super_col!r} not in input columns")
    values = [
        c
        for c in _value_columns(
            df.columns, timestamp, ttl, (super_col, *ignore, *passthrough)
        )
        if c != rk
    ]
    ts = _ts_col(df, timestamp, now)
    ttlc = _ttl_col(df, ttl)
    subcolumns = F.array(
        *[
            F.struct(
                F.lit(c).alias("name"),
                F.col(c).cast("string").alias("value"),
                ts.alias("ts"),
                ttlc.alias("ttl"),
            )
            for c in values
        ]
    )
    mutation = F.struct(
        F.col(super_col).cast("string").alias("super"),
        subcolumns.alias("columns"),
    )
    return df.select(
        F.col(rk).cast("string").alias("key"),
        F.array(mutation).alias("mutations"),
        *[F.col(c) for c in passthrough],
    )


def melt_to_mutations(
    df: DataFrame,
    rowkey: str | None = None,
    timestamp: str | None = None,
    ttl: str | None = None,
    ignore: Sequence[str] = (),
    now_ms: int | None = None,
) -> DataFrame:
    """Row-per-mutation view of `reshape_thrift` (key, name, value, ts, ttl).

    Equivalent to exploding the mutations array but expressed as a plan-time
    unpivot (`stack`) so Catalyst sees a single generate — and the oracle can
    express it as UNION ALL / UNPIVOT.
    """
    now = now_ms if now_ms is not None else int(time.time() * 1000)
    rk = _resolve_rowkey(df.columns, rowkey)
    values = [c for c in _value_columns(df.columns, timestamp, ttl, ignore) if c != rk]
    ts = _ts_col(df, timestamp, now)
    ttlc = _ttl_col(df, ttl)
    stack_args: list[Column] = []
    for c in values:
        stack_args.append(F.lit(c))
        stack_args.append(F.col(c).cast("string"))
    return df.select(
        F.col(rk).cast("string").alias("key"),
        F.stack(F.lit(len(values)), *stack_args).alias("name", "value"),
        ts.alias("ts"),
        ttlc.alias("ttl"),
    )


CONVENTION_ROWKEY = "rowkey"
CONVENTION_TIMESTAMP = "timestamp"
CONVENTION_TTL = "ttl"


def reshape_thrift_by_convention(df: DataFrame, now_ms: int | None = None) -> DataFrame:
    """P6 `Thrift.byConvention` (Thrift.java:22-30): special fields are found
    by the conventional names `rowkey`/`timestamp`/`ttl`; missing timestamp or
    ttl fields are tolerated (the reference logs and falls back,
    ThriftByFieldNamesFn.java:56-77)."""
    cols = set(df.columns)
    if CONVENTION_ROWKEY not in cols:
        raise ValueError(f"byConvention requires a '{CONVENTION_ROWKEY}' column")
    return reshape_thrift(
        df,
        rowkey=CONVENTION_ROWKEY,
        timestamp=CONVENTION_TIMESTAMP if CONVENTION_TIMESTAMP in cols else None,
        ttl=CONVENTION_TTL if CONVENTION_TTL in cols else None,
        now_ms=now_ms,
    )
