"""Bucketed range join vs DuckDB's native range join, plus the plan property
that makes it scale (hash join on bucket keys, never a nested loop)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hdfs2cass_spark.operators.rangejoin import range_join
from hdfs2cass_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def intervals(spark, sf_dir):
    """Deterministic synthetic maintenance windows spanning the events range:
    36 windows of varied lengths (30min - 5h), some overlapping, one empty."""
    e = load_table(spark, sf_dir, "events")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    base = int(lo.timestamp())
    span = max(int(hi.timestamp()) - base, 3600)
    rows = []
    for i in range(36):
        s = base + (i * span) // 40
        dur = [1800, 3600, 7200, 18000][i % 4]
        rows.append((i, s, s + dur))
    rows.append((99, base + span // 2, base + span // 2))  # empty: end == start
    return spark.createDataFrame(rows, "win_id INT, s LONG, e LONG").select(
        "win_id",
        F.timestamp_seconds("s").alias("w_start"),
        F.timestamp_seconds("e").alias("w_end"),
    )


def test_range_join_matches_duckdb(spark, sf_dir, intervals, tmp_path):
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    got = range_join(events, intervals, "ts", "w_start", "w_end").select(
        "event_id", "win_id"
    )
    g = sorted((r["event_id"], r["win_id"]) for r in got.collect())

    events.write.mode("overwrite").parquet(str(tmp_path / "ev"))
    intervals.write.mode("overwrite").parquet(str(tmp_path / "iv"))
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT e.event_id, i.win_id
        FROM read_parquet('{tmp_path}/ev/*.parquet') e
        JOIN read_parquet('{tmp_path}/iv/*.parquet') i
          ON e.ts >= i.w_start AND e.ts < i.w_end
        ORDER BY e.event_id, i.win_id
        """
    ).fetchall()
    assert g == sorted(want)
    assert len(g) > 0  # the fixture actually exercises matches


def test_range_join_is_a_hash_join(spark, sf_dir, intervals):
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    out = range_join(events, intervals, "ts", "w_start", "w_end")
    p = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "HashJoin" in p  # equi-join on the bucket key


def test_range_join_rejects_bad_width(spark, sf_dir, intervals):
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    with pytest.raises(ValueError):
        range_join(events, intervals, "ts", "w_start", "w_end", bucket_width_sec=0)
