"""Committed-fixture integrity: the golden parquet fixtures the oracles join
against must stay consistent with the code that defines them — a change to
the key encoding, token functions, or k-means without regenerating the
fixtures would silently shift the goalposts the oracle checks against."""

import os
import struct

import pyarrow.parquet as pq

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def test_customer_token_fixture_matches_spec():
    from hdfs2cass_spark.functions.md5token import TOKEN_WIDTH, md5_token, range_per_bucket_md5
    from hdfs2cass_spark.functions.murmur3 import cassandra_token

    t = pq.read_table(f"{FIXTURES}/tokens_customer.parquet")
    n = t.num_rows
    md5_range8 = range_per_bucket_md5(8)
    # every ~40th row: full scan is seconds of pure-python murmur3 — sampling
    # still catches wholesale drift or corruption
    for i in range(0, n, max(1, n // 40)):
        k = t.column("c_custkey")[i].as_py()
        key = struct.pack(">q", k)
        assert t.column("token")[i].as_py() == cassandra_token(key)
        md5t = md5_token(key)
        assert t.column("md5_token")[i].as_py() == str(md5t).zfill(TOKEN_WIDTH)
        assert t.column("md5_bucket8")[i].as_py() == md5t // md5_range8


def test_lineitem_token_fixture_matches_spec():
    from hdfs2cass_spark.functions.murmur3 import cassandra_token
    from hdfs2cass_spark.functions.serde import compose_partition_key

    t = pq.read_table(f"{FIXTURES}/tokens_lineitem.parquet")
    n = t.num_rows
    for i in range(0, n, max(1, n // 40)):
        ok = t.column("l_orderkey")[i].as_py()
        ln = t.column("l_linenumber")[i].as_py()
        pk = compose_partition_key(struct.pack(">q", ok), struct.pack(">i", ln))
        assert t.column("pk_hex")[i].as_py() == pk.hex().upper()
        assert t.column("token")[i].as_py() == cassandra_token(pk)


def test_ivf_centroid_fixture_matches_kmeans(spark):
    """Re-fitting on the same data with the same hyperparameters must
    reproduce the committed model exactly (the whole point of the
    deterministic k-means contract)."""
    from hdfs2cass_spark.operators.kmeans import fit_kmeans
    from hdfs2cass_spark.sources.readers import load_table

    t = pq.read_table(f"{FIXTURES}/ivf_centroids.parquet")
    committed = [list(c) for c in t.column("centroid").to_pylist()]
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    refit = fit_kmeans(emb, k=8, iters=4)
    assert refit == committed
