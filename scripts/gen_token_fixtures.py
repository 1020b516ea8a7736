"""Generate golden-token parquet fixtures for the token-routing oracles.

Cassandra Murmur3/MD5 tokens are not expressible in DuckDB SQL, so the oracle
for `token_route_customer` (both partitioner branches) / `bulk_route_lineitem` is a
JOIN against fixtures computed ONCE here by the golden-tested Python
implementations (functions/murmur3.py — golden constants from the reference's
CassandraKeyComparatorTest.java:53-67 — and functions/md5token.py).

Covers every key value in sf0.001 / sf0.01 / sf0.1 (tokens are a pure function
of the key bytes, so one fixture serves all scale factors).

Run from the repo root:  python scripts/gen_token_fixtures.py
Outputs: fixtures/tokens_customer.parquet, fixtures/tokens_lineitem.parquet
"""

from __future__ import annotations

import os
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdfs2cass_spark.functions.md5token import TOKEN_WIDTH, md5_token, range_per_bucket_md5
from hdfs2cass_spark.functions.murmur3 import cassandra_token
from hdfs2cass_spark.functions.serde import compose_partition_key

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def customer_fixture() -> None:
    keys: set[int] = set()
    for sf in SFS:
        t = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey"])
        keys.update(t.column("c_custkey").to_pylist())
    ks = sorted(keys)
    md5_range8 = range_per_bucket_md5(8)
    rows = {
        "c_custkey": ks,
        # typed single-column key: 8-byte big-endian bigint (the Cassandra
        # encoding CassandraRecordUtils.toByteBuffer emits for a Long)
        "token": [cassandra_token(struct.pack(">q", k)) for k in ks],
        "md5_token": [str(md5_token(struct.pack(">q", k))).zfill(TOKEN_WIDTH) for k in ks],
        "md5_bucket8": [md5_token(struct.pack(">q", k)) // md5_range8 for k in ks],
    }
    pq.write_table(pa.table(rows), f"{OUT}/tokens_customer.parquet")
    print(f"tokens_customer.parquet: {len(ks)} keys")


def lineitem_fixture() -> None:
    keys: set[tuple[int, int]] = set()
    for sf in SFS:
        t = pq.read_table(f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"])
        keys.update(zip(t.column("l_orderkey").to_pylist(), t.column("l_linenumber").to_pylist()))
    ks = sorted(keys)
    pks = [
        compose_partition_key(struct.pack(">q", ok), struct.pack(">i", ln)) for ok, ln in ks
    ]
    rows = {
        "l_orderkey": [k[0] for k in ks],
        "l_linenumber": [k[1] for k in ks],
        "pk_hex": [pk.hex().upper() for pk in pks],  # matches Spark's hex()
        "token": [cassandra_token(pk) for pk in pks],
    }
    pq.write_table(pa.table(rows), f"{OUT}/tokens_lineitem.parquet")
    print(f"tokens_lineitem.parquet: {len(ks)} keys")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    customer_fixture()
    lineitem_fixture()
