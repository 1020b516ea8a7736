"""Streaming bulk-load: the reference dataflow fed by a stream.

The reference is batch-only; this extension runs the same
reshape -> token-route -> sorted-bucket sink per micro-batch via foreachBatch.
Each micro-batch appends its own token-sorted bucket files — the same
append-only-within-bucket contract, amortized over time. A real deployment
points the writer at the Cassandra connector instead of parquet; everything
upstream is identical.

foreachBatch (not a custom streaming sink) because the route step needs a
batch-scoped repartition+sort — exactly the operation Structured Streaming's
continuous sinks can't express, and the documented escape hatch for it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..config import CassandraParams
from ..operators.partitioning import binary_key_expr, route_to_buckets
from ..operators.reshape import reshape_cql, resolve_rowkey


def stream_bulk_load(
    stream: DataFrame,
    output_uri: str,
    sink_path: str,
    checkpoint: str,
    rowkey: str | None = None,
    timestamp: str | None = None,
    ttl: str | None = None,
    ignore: Sequence[str] = (),
    now_ms: int | None = None,
    available_now: bool = False,
):
    """Start the streaming bulk-load query; returns the StreamingQuery."""
    params = CassandraParams.parse(output_uri)
    n = params.num_partitions()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # tokens come from the TYPED key bytes (_pk), exactly like the batch
        # pipeline — tokenizing the stringified rowkey diverges from the real
        # ring for every non-string key. The upfront repartition spreads a
        # one-file micro-batch (ONE scan partition) so the token UDF doesn't
        # run single-core before the bucket shuffle.
        rk = resolve_rowkey(batch_df.columns, rowkey)
        npart = batch_df.sparkSession.sparkContext.defaultParallelism
        batch_df = batch_df.repartition(npart)
        keyed = batch_df.withColumn("_pk", binary_key_expr(batch_df, [rk]))
        reshaped = reshape_cql(
            keyed, rk, timestamp, ttl, ignore, now_ms=now_ms, passthrough=["_pk"]
        )
        routed = route_to_buckets(
            reshaped, n, key_col="_pk", distribute_randomly=params.distribute_randomly
        )
        routed.write.mode("append").partitionBy("bucket").parquet(sink_path)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
