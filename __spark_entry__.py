"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the declared-query registry in
``hdfs2cass_spark.plans`` — every implemented operator from SURVEY.md §2 (plus
the analytics/LLM extension surface) registers itself there with a PySpark
callable and, where SQL-expressible, the DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped join+agg+topk."""
    from hdfs2cass_spark.plans import CATALOG

    return CATALOG["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hdfs2cass_spark.plans import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from hdfs2cass_spark.plans import get_oracles

    return get_oracles()
