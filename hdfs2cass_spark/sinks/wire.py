"""Sink-boundary wire encoding: logical rows -> Cassandra insert byte form.

The reference serializes every field to ByteBuffer in the map phase
(CQLRecord.java:87-95, via CassandraRecordUtils.toByteBuffer) and binds the
prepared statement ``INSERT ... VALUES (?, ...) USING TIMESTAMP ? AND TTL ?``
with timestamp/ttl appended as the LAST TWO bound values
(CQLRecord.java:49-52, CassandraClusterInfo.java:160-172).

Spark-first placement: serialization happens at the *sink boundary only* —
Catalyst keeps native types through reshape/route (pushdown, codegen, columnar
parquet all stay available), and one Arrow-batched mapInPandas emits the exact
wire bytes the SSTable writer would consume.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions import serde as _serde_mod
from ..functions.serde import schema_encoder
from ..functions.shippable import pickle_by_value

# the encoder closures reference functions.serde — ship it by value so
# executors without this package on PYTHONPATH can still run the UDFs
pickle_by_value(_serde_mod)

def _token_field(routed: DataFrame) -> StructField:
    """Murmur3-routed frames carry bigint tokens; RandomPartitioner (MD5)
    frames carry 39-char zero-padded decimal STRING tokens (128-bit values
    exceed every JVM numeric — functions/md5token.py). The wire schema must
    follow the routed frame's dtype or Arrow rejects the batch."""
    return StructField("token", routed.schema["token"].dataType)


WIRE_SCHEMA = StructType(
    [
        StructField("pk", BinaryType()),
        StructField("token", LongType()),
        StructField("bucket", IntegerType()),
        StructField("values", ArrayType(BinaryType())),
        StructField("writetime", LongType()),
        StructField("ttl", IntegerType()),
    ]
)


def _with_token_dtype(schema: StructType, routed: DataFrame) -> StructType:
    return StructType(
        [_token_field(routed) if f.name == "token" else f for f in schema.fields]
    )


def encode_cql_wire(routed: DataFrame) -> DataFrame:
    """Encode a routed reshape_cql output (`_rowkey`, value cols, writetime,
    ttl, token, bucket) into bound-statement wire form.

    `values` holds the serialized bind values in column order with writetime
    and ttl appended last — exactly the reference's CQLRecord layout.
    """
    meta = {"_rowkey", "_pk", "writetime", "ttl", "token", "bucket"}
    value_cols = [c for c in routed.columns if c not in meta]
    has_pk = "_pk" in routed.columns
    # encoders are bound to the DECLARED column types (like Cassandra's
    # per-column TypeSerializers) — value-type inference would mis-encode
    # nullable int columns, which Arrow->pandas hands over as float64
    encoders = [schema_encoder(routed.schema[c].dataType) for c in value_cols]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = [pdf[c].to_numpy() for c in value_cols]
            wt = pdf["writetime"].to_numpy()
            ttl = pdf["ttl"].to_numpy()
            # the USING TIMESTAMP ? AND TTL ? bind parameters are bigint/int —
            # fixed widths, not value-inferred
            values = [
                [enc(col[i]) for enc, col in zip(encoders, cols)]
                + [struct.pack(">q", int(wt[i])), struct.pack(">i", int(ttl[i]))]
                for i in range(len(pdf))
            ]
            # pk = the typed partition-key bytes when the pipeline provides
            # them (_pk — single-column typed encoding or composite envelope);
            # utf-8 of the display rowkey only for bare reshape outputs
            if has_pk:
                pk = pdf["_pk"].map(lambda b: bytes(b) if b is not None else b"")
            else:
                pk = pdf["_rowkey"].map(lambda s: s.encode("utf-8") if s else b"")
            yield pd.DataFrame(
                {
                    "pk": pk,
                    "token": pdf["token"],
                    "bucket": pdf["bucket"],
                    "values": values,
                    "writetime": pdf["writetime"],
                    "ttl": pdf["ttl"],
                }
            )

    return routed.mapInPandas(batches, _with_token_dtype(WIRE_SCHEMA, routed))


THRIFT_WIRE_SCHEMA = StructType(
    [
        StructField("pk", BinaryType()),
        StructField("token", LongType()),
        StructField("bucket", IntegerType()),
        StructField(
            "mutations",
            ArrayType(
                StructType(
                    [
                        StructField("name", BinaryType()),
                        StructField("value", BinaryType()),
                        StructField("ts", LongType()),
                        StructField("ttl", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def encode_thrift_wire(routed: DataFrame) -> DataFrame:
    """W2: routed reshape_thrift output (key, mutations, token, bucket) ->
    wire form: one Mutation per column with name/value as Cassandra bytes,
    ms timestamp and ttl carried through (CrunchBulkRecordWriter.java:163-209;
    expiring columns keep their ttl, the writer computes expiry from it)."""

    has_pk = "_pk" in routed.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_muts = []
            for muts in pdf["mutations"]:
                out_muts.append(
                    [
                        {
                            "name": str(m["name"]).encode("utf-8"),
                            "value": b"" if m["value"] is None else str(m["value"]).encode("utf-8"),
                            "ts": int(m["ts"]),
                            "ttl": int(m["ttl"]),
                        }
                        for m in muts
                    ]
                )
            if has_pk:
                pk = pdf["_pk"].map(lambda b: bytes(b) if b is not None else b"")
            else:
                pk = pdf["key"].map(lambda s: s.encode("utf-8") if s else b"")
            yield pd.DataFrame(
                {
                    "pk": pk,
                    "token": pdf["token"],
                    "bucket": pdf["bucket"],
                    "mutations": out_muts,
                }
            )

    return routed.mapInPandas(batches, _with_token_dtype(THRIFT_WIRE_SCHEMA, routed))


COUNTER_WIRE_SCHEMA = StructType(
    [
        StructField("pk", BinaryType()),
        StructField("token", LongType()),
        StructField("bucket", IntegerType()),
        StructField(
            "mutations",
            ArrayType(
                StructType(
                    [
                        StructField("name", BinaryType()),
                        StructField("delta", LongType()),
                    ]
                )
            ),
        ),
    ]
)


def encode_thrift_counter_wire(routed: DataFrame) -> DataFrame:
    """W2 counter wire form: (pk, token, bucket, mutations: [(name, delta)]).

    No timestamp/ttl — the counter write path assigns them
    (CrunchBulkRecordWriter.java:188-190, addCounterColumn(name, value))."""
    has_pk = "_pk" in routed.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_muts = [
                [
                    {"name": str(m["name"]).encode("utf-8"), "delta": int(m["delta"])}
                    for m in muts
                ]
                for muts in pdf["mutations"]
            ]
            if has_pk:
                pk = pdf["_pk"].map(lambda b: bytes(b) if b is not None else b"")
            else:
                pk = pdf["key"].map(lambda s: s.encode("utf-8") if s else b"")
            yield pd.DataFrame(
                {
                    "pk": pk,
                    "token": pdf["token"],
                    "bucket": pdf["bucket"],
                    "mutations": out_muts,
                }
            )

    return routed.mapInPandas(batches, _with_token_dtype(COUNTER_WIRE_SCHEMA, routed))


SUPER_WIRE_SCHEMA = StructType(
    [
        StructField("pk", BinaryType()),
        StructField("token", LongType()),
        StructField("bucket", IntegerType()),
        StructField(
            "mutations",
            ArrayType(
                StructType(
                    [
                        StructField("super", BinaryType()),
                        StructField(
                            "columns",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("name", BinaryType()),
                                        StructField("value", BinaryType()),
                                        StructField("ts", LongType()),
                                        StructField("ttl", IntegerType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def encode_thrift_super_wire(routed: DataFrame) -> DataFrame:
    """W2 super-column wire form: routed reshape_thrift_super output ->
    (pk, token, bucket, mutations: [(super, [(name, value, ts, ttl)])]).

    Mirrors the reference's SUPER branch — the writer opens newSuperColumn(
    mutation.super_column.name) then adds each subcolumn as a regular or
    expiring column (CrunchBulkRecordWriter.java:174-186).
    """
    has_pk = "_pk" in routed.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_muts = []
            for muts in pdf["mutations"]:
                out_muts.append(
                    [
                        {
                            "super": str(m["super"]).encode("utf-8"),
                            "columns": [
                                {
                                    "name": str(c["name"]).encode("utf-8"),
                                    "value": b""
                                    if c["value"] is None
                                    else str(c["value"]).encode("utf-8"),
                                    "ts": int(c["ts"]),
                                    "ttl": int(c["ttl"]),
                                }
                                for c in m["columns"]
                            ],
                        }
                        for m in muts
                    ]
                )
            if has_pk:
                pk = pdf["_pk"].map(lambda b: bytes(b) if b is not None else b"")
            else:
                pk = pdf["key"].map(lambda s: s.encode("utf-8") if s else b"")
            yield pd.DataFrame(
                {
                    "pk": pk,
                    "token": pdf["token"],
                    "bucket": pdf["bucket"],
                    "mutations": out_muts,
                }
            )

    return routed.mapInPandas(batches, _with_token_dtype(SUPER_WIRE_SCHEMA, routed))
