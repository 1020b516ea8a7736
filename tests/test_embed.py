"""Feature-hashing text embedder: determinism, geometry, and the full
text -> embedding -> hyperplane-LSH near-dup loop."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hdfs2cass_spark.operators.embed import embed_texts


def _vecs(df):
    return {r[0]: list(r[1]) for r in df.collect()}


def test_embeddings_are_normalized_and_deterministic(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    a = _vecs(embed_texts(d, dims=32))
    b = _vecs(embed_texts(d, dims=32))
    assert a == b  # pure hash function of the text
    for v in a.values():
        n = math.sqrt(sum(x * x for x in v))
        assert n == 0 or abs(n - 1.0) < 1e-5
        assert len(v) == 32


def test_geometry_tracks_word_overlap(spark):
    rows = [
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog tonight"),
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
        Row(doc_id=2, text="completely different words about spark shuffles and rings"),
    ]
    v = _vecs(embed_texts(spark.createDataFrame(rows), dims=64))

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    near = cos(v[0], v[1])
    far = max(cos(v[0], v[2]), cos(v[1], v[2]))
    assert near > 0.8  # 9 of 10 words shared
    assert near > far + 0.3  # disjoint text is clearly separated


def test_empty_and_degenerate_texts(spark):
    rows = [Row(doc_id=0, text=""), Row(doc_id=1, text="word")]
    v = _vecs(embed_texts(spark.createDataFrame(rows), dims=16))
    # single-word doc: unit vector on one bucket; empty text explodes to a
    # single empty-string word -> still a defined unit vector, never NaN
    for vec in v.values():
        assert all(x == x for x in vec)  # no NaNs
    with pytest.raises(ValueError, match="dims"):
        embed_texts(spark.range(1).selectExpr("id AS doc_id", "'x' AS text"), dims=1)


def test_text_to_embedding_to_lsh_near_dup_loop(spark):
    """The loop the embedder exists for: near-dup TEXTS become near-dup
    VECTORS that hyperplane-LSH recovers."""
    from hdfs2cass_spark.operators.hyperplane import hyperplane_near_dup_pairs

    base = "w{} x{} y{} z{} a{} b{} c{} d{} e{} f{}"
    rows = []
    for i in range(40):
        words = base.format(*([i] * 10))
        rows.append(Row(doc_id=2 * i, text=words + " shared tail one"))
        rows.append(Row(doc_id=2 * i + 1, text=words + " shared tail two"))
    emb = embed_texts(spark.createDataFrame(rows), dims=64).withColumnRenamed(
        "doc_id", "vec_id"
    )
    pairs = hyperplane_near_dup_pairs(
        emb, threshold=0.8, id_col="vec_id", n_planes=6, multiprobe=1
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"planted-pair recall {recall}"


def test_embed_hash_twins_cross_recall(spark, tmp_path):
    """The xxhash64 production embedder and its md5 oracle twin
    (text_embed_near_dup_pairs_md5) hash words differently, so their vectors
    differ — but BOTH must recover planted near-identical text pairs: any
    systematic divergence between the hash families shows up as asymmetric
    recall (the minhash_lsh_pairs / _fast precedent, applied to the
    embedding loop). Also rejects an unknown hash_mode loudly."""
    from hdfs2cass_spark.plans.llm import text_embed_near_dup_pairs
    from hdfs2cass_spark.plans.textembed import text_embed_near_dup_pairs_md5

    # twins share 41 of 42 tokens -> hashed-BoW cosine ~0.976, comfortably
    # above both queries' 0.95 threshold (at 17/18 shared the cosine ~0.944
    # sits UNDER it and recall collapses by construction, not by hash bias)
    base = " ".join("t{}_" + str(j) for j in range(40))
    rows = []
    for i in range(40):
        words = base.format(*([i] * 40))
        rows.append(Row(doc_id=2 * i, text=words + " tail one"))
        rows.append(Row(doc_id=2 * i + 1, text=words + " tail two"))
    d = str(tmp_path / "twins")
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")

    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    for fn in (text_embed_near_dup_pairs, text_embed_near_dup_pairs_md5):
        got = {(r["doc_a"], r["doc_b"]) for r in fn(spark, d).collect()}
        recall = len(got & planted) / len(planted)
        assert recall >= 0.9, f"{fn.__name__} planted-pair recall {recall}"

    with pytest.raises(ValueError, match="hash_mode"):
        embed_texts(
            spark.range(1).selectExpr("id AS doc_id", "'x' AS text"),
            hash_mode="sha1",
        )


def test_embed_plan_stays_codegen(spark, sf_dir):
    """The aggregation must stay a plain HashAggregate of conditional sums:
    no ObjectHashAggregate (collect_list path), no Python, exactly one
    exchange — the measured 23x at 1M docs lives or dies on this shape."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = embed_texts(d, dims=32)._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" not in p
    assert "HashAggregate" in p and "partial_sum" in p  # map-side combine
    assert "EvalPython" not in p and "MapInPandas" not in p
    assert p.count("Exchange") == 1


def test_embed_codegen_width_bound(spark, sf_dir):
    """The documented codegen width bound: at dims=64 (under
    spark.sql.codegen.maxFields=100) the aggregate runs inside whole-stage
    codegen; at dims=512 it falls OUT of codegen but keeps the identical
    HashAggregate shape (map-side combine, no ObjectHashAggregate cliff, one
    exchange) and correct normalized output — the graceful ~2x-measured
    fallback, not silent wrongness."""
    import math

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    for dims, expect_codegen in ((64, True), (512, False)):
        df = embed_texts(d, dims=dims)
        rows = df.collect()
        # final (adaptive) plan only — the trailing '== Initial Plan =='
        # section never carries codegen stars
        p = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        aggs = [l for l in p.splitlines() if "HashAggregate" in l]
        assert aggs and all(("*(" in l) == expect_codegen for l in aggs), (
            dims,
            aggs,
        )
        assert "ObjectHashAggregate" not in p
        assert "partial_sum" in p
        for r in rows[:10]:
            v = list(r[1])
            assert len(v) == dims
            n = math.sqrt(sum(x * x for x in v))
            assert n == 0 or abs(n - 1.0) < 1e-5
