"""Live Cassandra sink (import-gated).

The production path for W1/W2 is the Spark Cassandra Connector
(``org.apache.spark.sql.cassandra``): it discovers the ring, routes rows to
replicas, batches by partition key and honors write throttling — everything
ExternalSSTableLoaderClient.java:57-137 and the streamthrottlembits URI param
do in the reference, but maintained upstream and AQE-compatible.

This container has no Cassandra cluster or connector jar, so the writer is a
thin, import-gated shim: constructing it works (unit-testable options
translation), calling ``write`` without the connector raises a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import CassandraParams


def connector_options(params: CassandraParams) -> dict[str, str]:
    """Translate the URI DSL (M2) into connector options."""
    opts = {
        "keyspace": params.keyspace,
        "table": params.table,
        "spark.cassandra.connection.host": params.host,
    }
    if params.port:
        opts["spark.cassandra.connection.port"] = str(params.port)
    if params.streamthrottlembits:
        # connector analog of the reference's stream throttle
        # (CrunchBulkRecordWriter.java:98-101)
        opts["spark.cassandra.output.throughputMBPerSec"] = str(params.streamthrottlembits)
    return opts


def write_to_cassandra(df: DataFrame, output_uri: str) -> None:
    params = CassandraParams.parse(output_uri)
    opts = connector_options(params)
    try:
        (
            df.write.format("org.apache.spark.sql.cassandra")
            .options(**opts)
            .mode("append")
            .save()
        )
    except Exception as e:  # connector jar absent in this environment
        raise NotImplementedError(
            "Live Cassandra writes need the spark-cassandra-connector jar on the "
            "classpath (--packages com.datastax.spark:spark-cassandra-connector). "
            f"Options that would be used: {opts}"
        ) from e
