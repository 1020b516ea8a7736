"""Physical-plan regression tests: the properties that make these queries
scale are asserted, not assumed — a refactor that silently loses a broadcast,
pushdown, or the single-shuffle bulk plan fails here."""

import re

import pytest

from hdfs2cass_spark.plans import CATALOG
from hdfs2cass_spark.sinks.pipeline import bulk_load


def _explain(spark, df, mode="simple"):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_q1_pushdown_and_pruning(spark, sf_dir):
    p = _explain(spark, CATALOG["q1_pricing_summary"].fn(spark, sf_dir), "formatted")
    assert re.search(r"PushedFilters: \[[^\]]*LessThanOrEqual\(l_shipdate", p)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "l_orderkey" not in m.group(1)  # unused columns pruned from the scan
    assert "partial_sum" in p  # map-side combine


def test_q5_all_joins_broadcast(spark, sf_dir):
    p = _explain(spark, CATALOG["q5_local_supplier_volume"].fn(spark, sf_dir))
    assert p.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in p


def test_q3_topk_never_global_sorts(spark, sf_dir):
    p = _explain(spark, CATALOG["q3_shipping_priority"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_bulk_load_single_shuffle_single_python_hop(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    routed = bulk_load(cust, "cql://h/ks/t?reducers=8", rowkey="c_custkey", now_ms=42)
    p = _explain(spark, routed)
    assert p.count("Exchange") == 1  # the bucket repartition — nothing else shuffles
    assert p.count("ArrowEvalPython") == 1  # the token UDF — nothing else crosses to Python
    assert "Sort [bucket" in p  # in-partition sort feeding the append-only sink


def test_semi_anti_join_plans(spark, sf_dir):
    semi = _explain(spark, CATALOG["semi_join_customers_with_orders"].fn(spark, sf_dir))
    anti = _explain(spark, CATALOG["anti_join_customers_without_orders"].fn(spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_sink_partition_pruning(spark, sf_dir, tmp_path):
    """Reading one bucket back from the simulated sink prunes the others at
    the file-listing level (PartitionFilters on the bucket dir column)."""
    out = str(tmp_path / "sink")
    bulk_load(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        "cql://h/ks/t?reducers=4",
        rowkey="c_custkey",
        now_ms=42,
        simulated_path=out,
    )
    back = spark.read.parquet(out).filter("bucket = 2")
    p = _explain(spark, back, "formatted")
    assert re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*2", p)
