"""Differential oracle tests: every catalog query with an oracle runs on Spark
AND DuckDB at sf0.001; results must match exactly (column names, row multiset).

This is a local twin of the driver's t2 correctness gate (BASELINE.md), kept in
the suite so a mismatch is caught on every test run, not once per round.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pytest

from hdfs2cass_spark.plans import CATALOG
from hdfs2cass_spark.sources.readers import TABLES

ORACLE_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is None)

# slow-tier params (r13 verdict item 1: fit the driver's verify budget):
# - text_embed_dedup_clusters_md5: 52 s, ~68 s of which is DUCKDB evaluating
#   the md5-embedding recursive CTE — not reducible without changing the
#   declared query. Its Spark plan stays covered by the default-tier
#   text_embed_near_dup_pairs_md5 oracle row and by the driver's own
#   rotating oracle gate, which runs outside pytest.
# - quality_classifier_learned (rows-only): the fn() re-FITS the logreg
#   (~19 s driver-side); the same fn is exercised every default run by
#   test_classifier.py's shared fixture.
_SLOW_PARAMS = {"text_embed_dedup_clusters_md5", "quality_classifier_learned"}


def _tiered(names):
    return [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARAMS else n
        for n in names
    ]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _norm_val(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm_val(x) for x in v)
    return v


def _norm_rows(rows):
    return sorted((tuple(_norm_val(v) for v in r) for r in rows), key=repr)


@pytest.mark.parametrize("name", _tiered(ORACLE_QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = CATALOG[name]
    sdf = q.fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(q.oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    s, d = _norm_rows(spark_rows), _norm_rows(duck_rows)
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    mismatches = [(a, b) for a, b in zip(s, d) if a != b][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"


@pytest.mark.parametrize("name", _tiered(ROWS_ONLY_QUERIES))
def test_rows_only_query_runs(spark, sf_dir, name):
    q = CATALOG[name]
    sdf = q.fn(spark, sf_dir)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0


def test_asof_join_same_ts_click_excluded(spark, tmp_path):
    """An error sharing its timestamp with a click must NOT match that click
    (oracle semantics: strictly c.ts < e.ts). The RANGE window frame
    guarantees this; a ROWS frame would silently include it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    S = 10**9
    base = 1704067200 * S
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([base, base + 60 * S, base + 60 * S], pa.timestamp("ns")),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "event_type": pa.array(["click", "click", "error"], pa.string()),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = CATALOG["asof_join_events"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["event_id"] == 3
    # matched the earlier click (ts=base), not the same-ts click (base+60s)
    assert got[0]["last_click_ts"] == datetime.datetime(2024, 1, 1, 0, 0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(CATALOG["asof_join_events"].oracle).fetchall()
    assert got[0]["last_click_ts"] == want[0][3]
