"""End-to-end bulk-load pipeline — the reference's single dataflow, Spark-first.

    scan -> reshape (P1/P2) -> key-extract (K1) -> token shuffle + sort (G1-G3) -> sink (W1/W2)

Canonical plan in the reference: Hdfs2Cass.java:107-128. Here it is one lazy
DataFrame lineage; Catalyst fuses the map-side work into a single stage (the
Crunch planner's DoFn fusion, but with whole-stage codegen), the one shuffle is
the token routing, and the sink write is the action.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..config import CassandraParams, TargetInfo
from ..operators.partitioning import route_to_buckets
from ..operators.reshape import reshape_cql, reshape_thrift
from .simulated import write_simulated_sstables


def bulk_load(
    df: DataFrame,
    output_uri: str,
    rowkey: str | list[str] | None = None,
    timestamp: str | None = None,
    ttl: str | None = None,
    ignore: Sequence[str] = (),
    target: TargetInfo | None = None,
    simulated_path: str | None = None,
    now_ms: int | None = None,
) -> DataFrame:
    """Run the full reference dataflow on any DataFrame (the library-embedding
    surface, SURVEY.md §3.3). Returns the routed DataFrame; if
    `simulated_path` is given, also writes the simulated-SSTable sink.

    Speculative execution stays disabled at the session level (the sink is
    side-effecting; Hdfs2Cass.java:100-101).
    """
    params = CassandraParams.parse(output_uri)
    n = params.num_partitions(target)
    if rowkey is None and target is not None and target.partition_key_columns:
        # M1: when target metadata is supplied, the partition key comes from
        # the table schema (CassandraClusterInfo.java:91-108), not a flag
        rowkey = list(target.partition_key_columns)
    if params.columnnames:
        missing = [c for c in params.columnnames if c not in df.columns]
        if missing:
            raise ValueError(f"columnnames= not in input: {missing}")
        df = df.select(*params.columnnames)

    composite = isinstance(rowkey, (list, tuple)) and len(rowkey) > 1
    if isinstance(rowkey, (list, tuple)) and not composite:
        rowkey = rowkey[0]

    # K1: the token is ALWAYS computed over the typed Cassandra encoding of the
    # key column(s) (CassandraRecordUtils.toByteBuffer via CassandraParams
    # .getKeyFn — e.g. 8-byte big-endian for a bigint), never its string form.
    # A stringified bigint key would hash to a different ring position than the
    # live cluster's. `_pk` carries those bytes; `_rowkey`/`key` stay as
    # human-readable display columns.
    from ..operators.partitioning import binary_key_expr
    from ..operators.reshape import resolve_rowkey

    key_cols = list(rowkey) if composite else [resolve_rowkey(df.columns, rowkey)]
    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        raise ValueError(f"rowkey columns not in input: {missing}")
    keyed = df.withColumn("_pk", binary_key_expr(df, key_cols))

    if params.protocol == "cql":
        reshaped = reshape_cql(
            keyed,
            key_cols[0],
            timestamp,
            ttl,
            ignore,
            now_ms=now_ms,
            passthrough=["_pk"],
        )
    else:
        if composite:
            raise ValueError("composite rowkeys are a CQL-path feature (thrift keys are single ByteBuffers)")
        reshaped = reshape_thrift(
            keyed, key_cols[0], timestamp, ttl, ignore, now_ms=now_ms, passthrough=["_pk"]
        )

    routed = route_to_buckets(
        reshaped,
        num_partitions=n,
        key_col="_pk",
        distribute_randomly=params.distribute_randomly,
        partitioner=target.partitioner if target is not None else None,
    )
    if simulated_path is not None:
        write_simulated_sstables(
            routed, simulated_path, compressionclass=params.compressionclass
        )
    return routed
