"""Topology-aware partitioning — the heart of the reference (G1-G3, K1).

The reference shuffles rows to the reducer owning their Cassandra token range and
sorts within each reducer by token so the SSTable writer appends without
re-sorting (SURVEY.md §2.1 G1-G3;
/root/reference/src/main/java/com/spotify/hdfs2cass/cassandra/utils/CassandraPartitioner.java:42-127,
CassandraKeyComparator.java:32-89, CassandraParams.java:288-334).

Spark-first design (100 TB rationale):
  - token: one Arrow-batched pandas UDF (Cassandra Murmur3 has no JVM built-in
    equivalent; xxhash64/hash are different algorithms). Everything else stays
    in Catalyst.
  - bucket: pure column arithmetic over fixed ring boundaries —
    ``(token - MIN) div range_per_bucket`` — NOT repartitionByRange (which
    *samples* boundaries; the ring gives us exact ones for free).
  - routing: ``df.repartition(n, "bucket")`` + ``sortWithinPartitions(bucket,
    token, key)``. Hash-partitioning on the bucket id may co-locate several
    buckets in one task (hash collision), but every bucket lands entirely in
    exactly one task and rows within it are token-sorted — the append-only sink
    contract holds per bucket, with ~n concurrent writers. This stays entirely
    in the DataFrame/Tungsten path: no Python round-trip of row data, which an
    RDD ``partitionBy`` would force on every byte at 100 TB.
  - bucket->partition shuffling (CassandraParams.java:319-328, avoids mapping
    ring order onto node order): a seeded permutation applied to the bucket id.
  - ``distribute_randomly`` escape hatch (CassandraPartitioner.java:58-60):
    round-robin repartition, no token routing.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.murmur3 import MIN_TOKEN, token_pandas_udf

RING_SIZE = 2**64  # Murmur3 LongToken ring


def with_token(df: DataFrame, key_col: str, token_col: str = "token") -> DataFrame:
    """K1+G2: append the Cassandra Murmur3 token of the partition-key column.

    `key_col` may be StringType (tokenized as UTF-8 bytes) or BinaryType
    (composite keys pre-composed via functions.serde.compose_partition_key).
    """
    tok = token_pandas_udf()
    return df.withColumn(token_col, tok(F.col(key_col)))


def bucket_expr(token_col: str, num_buckets: int) -> Column:
    """Exact ring-range bucket: floor((token - MIN_TOKEN) / range_per_bucket).

    Mirrors CassandraPartitioner.java:57-72 (the +2^63 rescale is the
    `- MIN_TOKEN` here). The unsigned offset spans [0, 2^64) — past int64 —
    so the division is computed EXACTLY in int64 by splitting off the low
    bit: with t2 = token >> 1 (arithmetic shift = floor halving), r = the low
    bit, and h = t2 + 2^62 (in [0, 2^63), never overflows),

        offset = 2*h + r
        bucket = 2*(h div R) + (2*(h mod R) + r) div R

    which is pure codegen'd long arithmetic. The previous DECIMAL(38,0)
    formulation was exact too but runs on Spark's interpreted Decimal path —
    on 600k rows at sf0.1 it added ~0.21s over the token stage, this form
    adds nothing measurable (differentially tested against exact Python
    big-int arithmetic
    across the full token range incl. every boundary +/-1 in
    tests/test_partitioning.py). The 2*(h mod R) term requires R <= 2^62,
    i.e. num_buckets >= 4; below that a (num_buckets-1)-comparison boundary
    chain is both exact and trivially cheap.
    """
    range_per = RING_SIZE // num_buckets + (1 if RING_SIZE % num_buckets else 0)
    if num_buckets < 4:
        # boundaries precomputed exactly in Python big-int; each fits int64
        bounds = [MIN_TOKEN + i * range_per for i in range(1, num_buckets)]
        if not bounds:
            return F.lit(0)
        terms = " + ".join(
            f"(CASE WHEN {token_col} >= {b}L THEN 1 ELSE 0 END)" for b in bounds
        )
        return F.expr(f"CAST({terms} AS INT)")
    half = 2**62
    return F.expr(
        f"CAST(2 * ((shiftright({token_col}, 1) + {half}L) DIV {range_per}L)"
        f" + (2 * ((shiftright({token_col}, 1) + {half}L) % {range_per}L)"
        f" + ({token_col} & 1)) DIV {range_per}L AS INT)"
    )


def shuffled_bucket_map(num_buckets: int, seed: int = 42) -> list[int]:
    """Deterministic permutation bucket->partition (CassandraParams.java:319-328
    shuffles the reducer list so adjacent ring ranges don't map to adjacent
    nodes; the reference uses Collections.shuffle — we pin a seed)."""
    perm = list(range(num_buckets))
    random.Random(seed).shuffle(perm)
    return perm


def with_bucket(
    df: DataFrame,
    num_buckets: int,
    token_col: str = "token",
    bucket_col: str = "bucket",
    shuffle_seed: int | None = 42,
) -> DataFrame:
    b = bucket_expr(token_col, num_buckets)
    if shuffle_seed is not None:
        mapping = shuffled_bucket_map(num_buckets, shuffle_seed)
        mapping_expr = F.element_at(F.array(*[F.lit(p) for p in mapping]), b + 1)
        b = mapping_expr
    return df.withColumn(bucket_col, b)


def with_md5_token_bucket(
    df: DataFrame,
    key_col: str,
    num_buckets: int,
    shuffle_seed: int | None = 42,
) -> DataFrame:
    """G2 RandomPartitioner branch: MD5 BigIntegerToken + bucket in one UDF
    pass (tokens are 128-bit — carried as sortable zero-padded strings).

    The md5 digest runs JVM-SIDE in whole-stage codegen (round 4 — hashlib
    per row in the Arrow batch was ~half the hop's runtime); empty/NULL keys
    map to the all-zero digest, whose 128-bit abs is exactly
    RandomPartitioner.ZERO. The Python hop is pure whole-batch numpy.
    """
    from ..functions.md5token import md5_token_bucket_udf

    tb = md5_token_bucket_udf(num_buckets)
    # Column API, not an interpolated SQL string: key_col names containing
    # dots/spaces/hyphens would need backticks in F.expr and either fail to
    # parse or resolve as a field path (F.col parses dots as field paths too,
    # hence the backtick quoting)
    key = F.col("`" + key_col.replace("`", "``") + "`")
    dig = F.when(
        key.isNull() | (F.length(key) == 0), F.unhex(F.lit("0" * 32))
    ).otherwise(F.unhex(F.md5(key.cast("binary"))))
    out = df.withColumn("_dig", dig).withColumn("_tb", tb(F.col("_dig"))).select(
        "*", F.col("_tb.token").alias("token"), F.col("_tb.bucket").alias("bucket")
    ).drop("_tb", "_dig")
    if shuffle_seed is not None:
        mapping = shuffled_bucket_map(num_buckets, shuffle_seed)
        out = out.withColumn(
            "bucket", F.element_at(F.array(*[F.lit(p) for p in mapping]), F.col("bucket") + 1)
        )
    return out


def route_to_buckets(
    df: DataFrame,
    num_partitions: int,
    key_col: str,
    distribute_randomly: bool = False,
    shuffle_seed: int | None = 42,
    partitioner: str | None = None,
) -> DataFrame:
    """G1-G3 composed: token -> bucket -> shuffle -> in-partition token sort.

    Output carries `token` and `bucket` columns; rows arrive at the sink in
    (bucket, token, key) order, i.e. decorated-key order within each bucket —
    the exact contract CassandraKeyComparator.java:32-35 establishes so the
    SSTable writer can append without re-sorting.

    `partitioner` selects the token branch exactly like
    CassandraPartitioner.java:63-68: the Murmur3 LongToken path (default) or
    the RandomPartitioner MD5/BigIntegerToken path.
    """
    from ..config import RANDOM

    if distribute_randomly:
        return df.repartition(num_partitions)
    if partitioner == RANDOM:
        routed = with_md5_token_bucket(df, key_col, num_partitions, shuffle_seed)
    else:
        routed = with_token(df, key_col)
        routed = with_bucket(routed, num_partitions, shuffle_seed=shuffle_seed)
    return routed.repartition(num_partitions, F.col("bucket")).sortWithinPartitions(
        "bucket", "token", key_col
    )


def binary_key_expr(df: DataFrame, cols: list[str]) -> Column:
    """K1: partition-key bytes as a pure-Catalyst expression.

    Single column -> raw bytes; multiple -> the composite envelope
    [2-byte len][bytes][0x00] per component (CassandraRecordUtils.java:230-261,
    differentially tested against functions.serde.compose_partition_key).

    Integer components use Cassandra's fixed-width big-endian encoding built
    from hex (two's-complement for negatives comes out of Spark's hex() on
    longs; ints take the low 8 hex chars). All JVM-side — no Python in the
    key path; the token UDF receives ready-made bytes.
    """
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    # each component is built as a HEX STRING and the whole key gets ONE
    # unhex at the end — one binary materialization instead of per-component
    # unhex + binary concat (measured ~2x on the encode step at sf0.1); the
    # composite length prefix is a literal for fixed-width types.
    # NULL components encode as the EMPTY buffer regardless of declared type
    # (CassandraRecordUtils.java:81-82 — toByteBuffer(null) -> empty;
    # functions/serde.to_cassandra_bytes is the tested Python twin), so a
    # null single-column key tokenizes to the empty-key MIN token, never a
    # null-propagated NULL key.
    def comp_hex(c: str) -> tuple[Column, Column | None, int | None]:
        """(hex fragment, runtime byte length or None, fixed byte length or None)."""
        dt = df.schema[c].dataType
        col = F.col(c)
        if isinstance(dt, (IntegerType, ShortType, ByteType)):
            # low 32 bits, big-endian: hex() of the long value, last 8 chars
            frag = F.substring(F.lpad(F.hex(col.cast("long")), 16, "0"), 9, 8)
            return F.when(col.isNull(), F.lit("")).otherwise(frag), None, 4
        if isinstance(dt, LongType):
            frag = F.lpad(F.hex(col), 16, "0")
            return F.when(col.isNull(), F.lit("")).otherwise(frag), None, 8
        if isinstance(dt, StringType):
            b = col.cast("binary")
            return F.coalesce(F.hex(b), F.lit("")), F.coalesce(F.octet_length(b), F.lit(0)), None
        b = col.cast("binary")
        return F.coalesce(F.hex(b), F.lit("")), F.coalesce(F.octet_length(b), F.lit(0)), None

    parts = [comp_hex(c) for c in cols]
    if len(parts) == 1:
        return F.unhex(parts[0][0])
    # lpad TRUNCATES strings longer than the target — a component over 65535
    # bytes would silently emit a corrupted 2-byte length. Fail loudly instead
    # (compose_partition_key, the Python twin, raises ValueError the same way).
    fragments: list[Column] = []
    for (hex_frag, nbytes, fixed), c in zip(parts, cols):
        if fixed is not None:
            fragments.append(
                F.when(F.col(c).isNull(), F.lit("0000")).otherwise(F.lit(format(fixed, "04x")))
            )
        else:
            fragments.append(
                F.when(
                    nbytes > 65535,
                    F.raise_error(
                        F.concat(
                            F.lit("composite key component exceeds 65535 bytes: "),
                            nbytes.cast("string"),
                        )
                    ),
                ).otherwise(F.lpad(F.hex(nbytes), 4, "0"))
            )
        fragments.append(hex_frag)
        fragments.append(F.lit("00"))
    return F.unhex(F.concat(*fragments))
