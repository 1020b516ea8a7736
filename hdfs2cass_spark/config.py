"""Target configuration: output URI DSL + table metadata.

Keeps the reference's URI grammar (M2, SURVEY.md §2.1;
/root/reference/src/main/java/com/spotify/hdfs2cass/cassandra/utils/CassandraParams.java:56-152,
README.md:80-96):

    (cql|thrift)://host[:port]/keyspace/table?reducers=N&columnnames=a,b
        &compressionclass=C&streamthrottlembits=M&distributerandomly&rpcport=P
        &mappers=&copiers=   (accepted but deprecated, warning logged)

The reference fetches table metadata live from the cluster at plan time
(CassandraClusterInfo.java:61-109). For offline execution/testing, ``TargetInfo``
is supplied from config instead; a live fetch belongs to the connector sink
(sinks/cassandra.py) and is import-gated.
"""

from __future__ import annotations

import logging
import warnings
from dataclasses import dataclass, field
from urllib.parse import parse_qsl, urlparse

log = logging.getLogger(__name__)

MURMUR3 = "org.apache.cassandra.dht.Murmur3Partitioner"
RANDOM = "org.apache.cassandra.dht.RandomPartitioner"


@dataclass
class TargetInfo:
    """Offline stand-in for CassandraClusterInfo (M1): everything the planner
    needs about the target table, injectable for tests."""

    keyspace: str
    table: str
    columns: list[str]
    partition_key_columns: list[str]
    partitioner: str = MURMUR3
    num_nodes: int = 3

    @property
    def partition_key_indexes(self) -> list[int]:
        return [self.columns.index(c) for c in self.partition_key_columns]

    def prepared_statement(self, column_names: list[str] | None = None) -> str:
        """The generated CQL insert the bulk writer binds rows against —
        byte-identical to CassandraClusterInfo.buildPreparedStatement
        (CassandraClusterInfo.java:160-172): columns in the given order
        (the columnnames= URI override, CassandraParams.java:87-94) or the
        table's, each value a bind marker, with the trailing
        ``USING TIMESTAMP ? AND TTL ?`` the per-row writetime/ttl bind to."""
        cols = list(column_names) if column_names is not None else list(self.columns)
        if not cols:
            raise ValueError("no columns to build the insert statement from")
        missing = [c for c in cols if c not in self.columns]
        if missing:
            raise ValueError(f"columns not in target table: {missing}")
        # the trailing space before each ')' is the reference's own quirk —
        # deleteCharAt removes only the final comma of "c1, c2, ", leaving
        # "c1, c2 " — kept so the statement text matches byte-for-byte
        names = "".join(f"{c}, " for c in cols)[:-2] + " "
        marks = "".join("?, " for _ in cols)[:-2] + " "
        return (
            f"INSERT INTO {self.keyspace}.{self.table} "
            f"({names}) VALUES ({marks}) USING TIMESTAMP ? AND TTL ?;"
        )


@dataclass
class CassandraParams:
    """Parsed output URI (M2)."""

    protocol: str  # "cql" | "thrift"
    host: str
    port: int | None
    keyspace: str
    table: str
    reducers: int | None = None  # default: number of cluster nodes (CassandraParams.java:111-115)
    columnnames: list[str] | None = None
    compressionclass: str | None = None
    streamthrottlembits: int | None = None
    distribute_randomly: bool = False
    rpcport: int | None = None
    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def parse(cls, uri: str) -> "CassandraParams":
        u = urlparse(uri)
        if u.scheme not in ("cql", "thrift"):
            raise ValueError(f"Unsupported output scheme: {u.scheme!r} (want cql:// or thrift://)")
        parts = [p for p in u.path.split("/") if p]
        if len(parts) != 2:
            raise ValueError(f"Output URI path must be /keyspace/table, got {u.path!r}")
        keyspace, table = parts
        params = cls(
            protocol=u.scheme,
            host=u.hostname or "localhost",
            port=u.port,
            keyspace=keyspace,
            table=table,
        )
        # keep_blank_values so bare flags like `distributerandomly` parse
        for k, v in parse_qsl(u.query, keep_blank_values=True):
            kl = k.lower()
            if kl == "reducers":
                params.reducers = int(v)
            elif kl == "columnnames":
                params.columnnames = v.split(",")
            elif kl == "compressionclass":
                params.compressionclass = v
            elif kl == "streamthrottlembits":
                params.streamthrottlembits = int(v)
            elif kl == "distributerandomly":
                params.distribute_randomly = True
            elif kl == "rpcport":
                params.rpcport = int(v)
            elif kl in ("mappers", "copiers"):
                warnings.warn(f"URI param {k}= is deprecated and ignored", stacklevel=2)
            else:
                params.extra[k] = v
        return params

    def num_partitions(self, target: TargetInfo | None = None) -> int:
        """Sink parallelism: explicit reducers= else #cluster nodes
        (CassandraParams.java:111-115)."""
        if self.reducers is not None:
            return self.reducers
        if target is not None:
            return target.num_nodes
        return 1


def target_info_from_metadata(table_meta, partitioner: str, num_nodes: int) -> TargetInfo:
    """Map live cluster metadata to :class:`TargetInfo` — the pure half of
    CassandraClusterInfo.init (CassandraClusterInfo.java:61-109), factored
    so tests drive it with duck-typed metadata while only the socket
    connect stays import-gated in :func:`fetch_target_info`.

    ``table_meta`` follows the DataStax python driver's TableMetadata
    shape: ``.keyspace_name``, ``.name``, ``.columns`` (ordered mapping
    name -> column), ``.partition_key`` (list of columns with ``.name``).
    Mirrors the reference's checks: a partition-key column missing from the
    column list raises (the 'no matching column for key' branch), and an
    unknown partitioner raises like its Class.forName failure."""
    if partitioner not in (MURMUR3, RANDOM):
        raise ValueError(f"No such partitioner: {partitioner}")
    columns = list(table_meta.columns)  # ordered names, the table's order
    pk = [c.name for c in table_meta.partition_key]
    missing = [c for c in pk if c not in columns]
    if missing:
        raise ValueError(f"no matching column for key {missing[0]}")
    return TargetInfo(
        keyspace=table_meta.keyspace_name,
        table=table_meta.name,
        columns=columns,
        partition_key_columns=pk,
        partitioner=partitioner,
        num_nodes=num_nodes,
    )


def fetch_target_info(
    host: str, keyspace: str, table: str, port: int | None = None
) -> TargetInfo:
    """Live plan-time metadata fetch (M1, CassandraClusterInfo.java:61-109):
    connect to the cluster, read the table's column order, partition key,
    partitioner class and node count. Import-gated on the DataStax python
    driver (absent in this environment — the sinks/cassandra.py precedent);
    the metadata -> TargetInfo mapping itself is
    :func:`target_info_from_metadata` and is unit-tested offline."""
    try:
        from cassandra.cluster import Cluster  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "Live metadata fetch needs the DataStax python driver "
            "(pip install cassandra-driver); offline callers construct "
            "TargetInfo from config instead."
        ) from e
    kwargs = {"contact_points": [host]}
    if port is not None:
        kwargs["port"] = port
    cluster = Cluster(**kwargs)
    try:
        cluster.connect()
        md = cluster.metadata
        ks = md.keyspaces.get(keyspace)
        tb = ks.tables.get(table) if ks is not None else None
        if tb is None:
            raise ValueError(f"No such keyspace/table: {keyspace}/{table}")
        return target_info_from_metadata(tb, md.partitioner, len(md.all_hosts()))
    finally:
        cluster.shutdown()
