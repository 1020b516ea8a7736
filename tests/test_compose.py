"""curate_corpus — the composed curation chain — against a DuckDB oracle
chain, plus the plan-level properties that make the composition one job."""

import duckdb
import pandas as pd
import pytest

from hdfs2cass_spark.plans.compose import (
    MAX_CONTAM_FRAC,
    MIN_UNIQ_RATIO,
    MIN_WORDS,
    curate_corpus,
)
from hdfs2cass_spark.plans.llm import SH_DUCK, W_DUCK, hash60_duck
from hdfs2cass_spark.plans.pipeline import _BENCH_DUCK, PACK_BUDGET


ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {W_DUCK} AS ws FROM documents
  WHERE NOT ({_BENCH_DUCK})),
q AS (
  SELECT doc_id, text, ws FROM base
  WHERE len(ws) >= {MIN_WORDS}
    AND CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) >= {MIN_UNIQ_RATIO}),
dd AS (
  SELECT doc_id, text, ws FROM (
    SELECT doc_id, text, ws,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM q) t
  WHERE rn = 1),
sh AS (
  SELECT doc_id, {hash60_duck("s")} AS h FROM (
    SELECT DISTINCT doc_id, s FROM (
      SELECT doc_id, unnest({SH_DUCK}) AS s FROM dd) t0) t1),
bench AS (
  SELECT DISTINCT {hash60_duck("s")} AS h FROM (
    SELECT unnest({SH_DUCK}) AS s FROM documents WHERE {_BENCH_DUCK}) t),
contaminated AS (
  SELECT sh.doc_id FROM sh LEFT JOIN bench USING (h)
  GROUP BY sh.doc_id
  HAVING CAST(COUNT(bench.h) AS DOUBLE) / COUNT(*) >= {MAX_CONTAM_FRAC}),
clean AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM dd
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT doc_id, n_tokens,
       COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset,
       COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // {PACK_BUDGET} AS seq_id
FROM clean ORDER BY doc_id
"""


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def test_curate_corpus_matches_oracle_chain(spark, sf_dir, duck):
    got = curate_corpus(spark, sf_dir).toPandas()
    want = duck.execute(ORACLE).df()
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    want = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    assert len(got) > 0  # the gates must not annihilate the fixture corpus
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_curate_corpus_is_one_lazy_plan(spark, sf_dir):
    """The whole chain must live in ONE Catalyst plan: no row-Python, no
    cartesian, the benchmark set broadcast, and the packing window sharded —
    i.e. composing the stages keeps every per-stage scale property."""
    df = curate_corpus(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p  # bench set + shard offsets
    assert "windowspecdefinition(_shard" in p  # distributed prefix-sum intact


def test_curate_corpus_gates_actually_gate(spark, sf_dir, duck):
    """Each stage must drop something on the fixture corpus (otherwise the
    composition test proves nothing about the gates)."""
    n_all = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    n_out = curate_corpus(spark, sf_dir).count()
    assert 0 < n_out < n_all
    # benchmark docs (1/20 of ids) are always excluded
    n_bench = duck.execute(
        f"SELECT COUNT(*) FROM documents WHERE {_BENCH_DUCK}"
    ).fetchone()[0]
    assert n_out <= n_all - n_bench
