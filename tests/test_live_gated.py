"""End-to-end drives of the import-gated LIVE paths with a faked DataStax
driver module (r11 verdict item 4).

fetch_target_info (config.py, M1) and the connector sink's option
translation were unit-tested only AROUND the import gate — the pure
metadata->TargetInfo mapping and the options dict. These tests inject a
stub ``cassandra``/``cassandra.cluster`` module into sys.modules and drive
the full connect -> metadata -> TargetInfo orchestration through the real
entry point, including the reference's two failure branches
(CassandraClusterInfo.java:61-109: unknown partitioner via the
Class.forName failure, partition-key column missing from the column list)
and the connection-lifecycle contract (shutdown always called, port kwarg
only passed when given).
"""

from __future__ import annotations

import sys
import types

import pytest

from hdfs2cass_spark.config import MURMUR3, RANDOM


class _Col:
    def __init__(self, name):
        self.name = name


class _Table:
    """Duck-typed DataStax TableMetadata: ordered .columns mapping,
    .partition_key list, .keyspace_name/.name."""

    def __init__(self, keyspace, name, columns, pk):
        self.keyspace_name = keyspace
        self.name = name
        self.columns = {c: _Col(c) for c in columns}
        self.partition_key = [_Col(c) for c in pk]


class _Keyspace:
    def __init__(self, tables):
        self.tables = tables


class _Metadata:
    def __init__(self, keyspaces, partitioner, n_hosts):
        self.keyspaces = keyspaces
        self.partitioner = partitioner
        self._n = n_hosts

    def all_hosts(self):
        return [object()] * self._n


class _FakeCluster:
    """Stub of cassandra.cluster.Cluster recording the connection
    lifecycle. Class attributes configure the next instance's metadata."""

    next_metadata: _Metadata | None = None
    instances: list = []

    def __init__(self, contact_points=None, port=None, **kwargs):
        self.contact_points = contact_points
        self.port = port
        self.kwargs = kwargs
        self.connected = False
        self.shut = False
        _FakeCluster.instances.append(self)

    def connect(self):
        self.connected = True

    @property
    def metadata(self):
        return _FakeCluster.next_metadata

    def shutdown(self):
        self.shut = True


@pytest.fixture
def fake_driver(monkeypatch):
    """Inject stub cassandra + cassandra.cluster modules so
    ``from cassandra.cluster import Cluster`` resolves to _FakeCluster."""
    pkg = types.ModuleType("cassandra")
    cluster_mod = types.ModuleType("cassandra.cluster")
    cluster_mod.Cluster = _FakeCluster
    pkg.cluster = cluster_mod
    monkeypatch.setitem(sys.modules, "cassandra", pkg)
    monkeypatch.setitem(sys.modules, "cassandra.cluster", cluster_mod)
    _FakeCluster.instances = []
    _FakeCluster.next_metadata = None
    return _FakeCluster


def _meta(partitioner=MURMUR3, columns=("id", "name", "val"), pk=("id",), n_hosts=5):
    t = _Table("ks", "t", list(columns), list(pk))
    return _Metadata({"ks": _Keyspace({"t": t})}, partitioner, n_hosts)


def test_fetch_target_info_happy_path(fake_driver):
    from hdfs2cass_spark.config import fetch_target_info

    fake_driver.next_metadata = _meta()
    ti = fetch_target_info("h1", "ks", "t")
    assert ti.keyspace == "ks" and ti.table == "t"
    assert ti.columns == ["id", "name", "val"]
    assert ti.partition_key_columns == ["id"]
    assert ti.partitioner == MURMUR3
    assert ti.num_nodes == 5
    (c,) = fake_driver.instances
    assert c.contact_points == ["h1"] and c.connected and c.shut
    # no port given -> the kwarg is NOT passed (driver default preserved)
    assert c.port is None


def test_fetch_target_info_passes_port(fake_driver):
    from hdfs2cass_spark.config import fetch_target_info

    fake_driver.next_metadata = _meta(partitioner=RANDOM, n_hosts=2)
    ti = fetch_target_info("h1", "ks", "t", port=9999)
    assert ti.partitioner == RANDOM and ti.num_nodes == 2
    assert fake_driver.instances[-1].port == 9999


def test_fetch_target_info_unknown_partitioner_branch(fake_driver):
    """The reference's Class.forName failure branch
    (CassandraClusterInfo.java:96-101) fired through the REAL entry point,
    not just the pure mapping helper — and the cluster is still shut
    down."""
    from hdfs2cass_spark.config import fetch_target_info

    fake_driver.next_metadata = _meta(partitioner="org.example.WeirdPartitioner")
    with pytest.raises(ValueError, match="No such partitioner"):
        fetch_target_info("h1", "ks", "t")
    assert fake_driver.instances[-1].shut


def test_fetch_target_info_missing_key_column_branch(fake_driver):
    """The reference's 'no matching column for key' branch
    (CassandraClusterInfo.java:103-108) through the real entry point."""
    from hdfs2cass_spark.config import fetch_target_info

    fake_driver.next_metadata = _meta(columns=("name", "val"), pk=("id",))
    with pytest.raises(ValueError, match="no matching column for key"):
        fetch_target_info("h1", "ks", "t")
    assert fake_driver.instances[-1].shut


@pytest.mark.parametrize("ks,tb", [("nope", "t"), ("ks", "nope")])
def test_fetch_target_info_missing_keyspace_or_table(fake_driver, ks, tb):
    from hdfs2cass_spark.config import fetch_target_info

    fake_driver.next_metadata = _meta()
    with pytest.raises(ValueError, match="No such keyspace/table"):
        fetch_target_info("h1", ks, tb)
    assert fake_driver.instances[-1].shut


def test_connector_sink_gated_write_raises_with_options(spark):
    """write_to_cassandra drives the real df.write.format(...) path; with
    no connector jar the failure must surface as NotImplementedError that
    carries the translated options (so an operator knows exactly what a
    connector-equipped cluster would receive)."""
    from hdfs2cass_spark.sinks.cassandra import write_to_cassandra

    df = spark.range(3).selectExpr("id", "CAST(id AS STRING) AS name")
    with pytest.raises(NotImplementedError) as ei:
        write_to_cassandra(
            df, "cql://h1:9042/ks/t?streamthrottlembits=7"
        )
    msg = str(ei.value)
    assert "spark.cassandra.connection.host" in msg and "'h1'" in msg
    assert "spark.cassandra.output.throughputMBPerSec" in msg and "'7'" in msg
    assert "spark.cassandra.connection.port" in msg and "'9042'" in msg
