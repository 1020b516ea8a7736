"""curate_corpus — the composed curation chain — against a DuckDB oracle
chain, plus the plan-level properties that make the composition one job."""

import duckdb
import pandas as pd
import pytest

from hdfs2cass_spark.plans.compose import ORACLE, curate_corpus
from hdfs2cass_spark.plans.pipeline import _BENCH_DUCK


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


def test_curate_corpus_keeps_scale_properties(spark, sf_dir):
    """Composing the stages must keep every per-stage scale property in the
    final (post-clustering) plan: no row-Python, no cartesian, the benchmark
    set broadcast, the packing window sharded, and the LSH bucket gate's
    count-before-collect intact."""
    df = curate_corpus(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p  # bench set + shard offsets
    assert "windowspecdefinition(_shard" in p  # distributed prefix-sum intact


def test_curate_corpus_upstream_chain_executes_once(spark, sf_dir):
    """The returned (lazy) plan must read the exact-dedup SURVIVORS from the
    round-6 localCheckpoint, not re-run quality + dedup per action: before
    the fix every action paid the two heaviest stages a second time (they
    already ran at construction to feed connected components). Evidence: the
    action plan contains a materialized-RDD scan and NO keep-first
    row_number window (the only row_number in the chain), and no SQL-cache
    entry leaks into the session."""
    df = curate_corpus(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in p  # survivors read from the checkpoint
    assert "row_number" not in p  # dedup window absent from the action plan
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


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


def test_curate_corpus_degenerate_corpora(spark, tmp_path):
    """The chain must not die on the degenerate shapes a real crawl throws
    at it: an all-identical corpus (exact dedup leaves ONE doc, the near-dup
    stage sees zero pairs — the connected-components empty-edges path) and a
    corpus the quality gate annihilates (empty downstream everywhere,
    including the prefix-sum over zero rows)."""
    import pyspark.sql.functions as F

    import hashlib

    def is_bench(i):
        return int(hashlib.md5(f"bench:{i}".encode()).hexdigest()[:15], 16) % 20 == 0

    # 40 identical docs, ids chosen so NONE is benchmark (empty bench set:
    # the broadcast-empty decontam path): exact dedup -> exactly 1 survivor
    ids = [i for i in range(200) if not is_bench(i)][:40]
    same = spark.createDataFrame(
        [(i, "the same document body with plenty of distinct words here") for i in ids],
        "doc_id long, text string",
    )
    d1 = str(tmp_path / "same")
    same.write.parquet(f"{d1}/documents.parquet")
    rows = curate_corpus(spark, d1).collect()
    assert len(rows) == 1 and rows[0]["start_offset"] == 0

    # identical corpus WITH benchmark members: the bench sample contains the
    # same text, so decontamination correctly drops the lone dedup survivor
    allsame = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.lit("the same document body with plenty of distinct words here").alias(
            "text"
        ),
    )
    d3 = str(tmp_path / "same_bench")
    allsame.write.parquet(f"{d3}/documents.parquet")
    assert any(is_bench(i) for i in range(40))
    assert curate_corpus(spark, d3).count() == 0

    # all docs fail the quality gate (too short) -> empty output, no crash
    junk = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit("tiny doc").alias("text")
    )
    d2 = str(tmp_path / "junk")
    junk.write.parquet(f"{d2}/documents.parquet")
    assert curate_corpus(spark, d2).count() == 0


def test_streaming_twin_exact_dedup_is_skew_safe(spark):
    """20k identical copies of one text must dedup in seconds: the exact
    stage aggregates a min-keeper per hash (map-side combinable) instead of
    self-joining the hash table, which would expand 20k^2 = 4e8 rows on this
    hot-text shape — the all-identical-crawl case streaming dedup exists
    for."""
    import time

    import pyspark.sql.functions as F

    from hdfs2cass_spark.streaming.curate import curate_decisions_batch

    hot = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same document body with plenty of distinct words here").alias(
            "text"
        ),
    )
    bench = spark.createDataFrame([("no such shingle anywhere",)], "s string")
    t0 = time.monotonic()
    rows = curate_decisions_batch(hot, bench).filter("kept").collect()
    assert time.monotonic() - t0 < 60
    assert [r["doc_id"] for r in rows] == [0]


def test_curate_corpus_near_dup_stage_gates(spark, sf_dir, duck):
    """The near-dup stage must drop the non-keeper member of at least one
    verified cluster among the exact-dedup survivors (the fixture corpus
    plants near-dups), and every kept doc_id must be its own cluster keeper."""
    kept = {r.doc_id for r in curate_corpus(spark, sf_dir).select("doc_id").collect()}
    clusters = duck.execute(ORACLE.split("comp AS")[0].rstrip().rstrip(",")
                            + " SELECT src AS doc_id, MIN(dst) AS keeper"
                            " FROM reach GROUP BY src").fetchall()
    losers = {d for d, k in clusters if k != d}
    assert losers, "fixture corpus must contain near-dup clusters post-dedup"
    assert not (kept & losers)
