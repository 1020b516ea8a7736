"""Cross-twin invariant for the xxhash64 LSH fast path.

``minhash_lsh_pairs_fast`` is the one declared query without a DuckDB oracle
(JVM-native xxhash64 has no DuckDB twin). This test supplies the missing
evidence as an invariant instead: on a corpus with PLANTED near-duplicate
pairs, the fast twin and the oracle-checked md5 twin must recover the same
planted pairs, up to LSH banding probability.

Planting: each twin document is its base plus ONE appended word — shingle
jaccard ~0.97 (98 of 101 shingles shared at 100 words), so the per-family
catch probability at 4 bands x 4 rows is 1-(1-s^4)^4 > 0.999. Any systematic
divergence between the hash families would show up as asymmetric recall.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs2cass_spark.plans.llm import minhash_lsh_pairs, minhash_lsh_pairs_fast

N_BASE = 400
N_PLANTED = 50
TWIN_OFFSET = 10_000


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lsh_twins"))
    words = (
        "array_join(transform(sequence(1, 100), "
        "j -> concat('w', pmod(hash(cid * 31 + j), 50000))), ' ')"
    )
    base = spark.range(N_BASE).select(
        F.col("id").alias("doc_id"), F.col("id").alias("cid")
    )
    twins = spark.range(N_PLANTED).select(
        (F.col("id") + TWIN_OFFSET).alias("doc_id"), F.col("id").alias("cid")
    )
    docs = base.unionAll(twins).select(
        "doc_id",
        F.when(
            F.col("doc_id") >= TWIN_OFFSET, F.concat(F.expr(words), F.lit(" zextra"))
        )
        .otherwise(F.expr(words))
        .alias("text"),
    )
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _planted_found(pairs_df) -> set[int]:
    """Base ids whose (base, base+OFFSET) planted pair was recovered."""
    rows = pairs_df.filter(
        (F.col("doc_b") == F.col("doc_a") + TWIN_OFFSET) & (F.col("doc_a") < N_PLANTED)
    ).collect()
    return {r["doc_a"] for r in rows}


def test_fast_twin_recovers_same_planted_pairs(spark, planted_dir):
    md5_found = _planted_found(minhash_lsh_pairs(spark, planted_dir))
    fast_found = _planted_found(minhash_lsh_pairs_fast(spark, planted_dir))
    # each family individually: near-certain catch at jaccard ~0.97
    assert len(md5_found) >= N_PLANTED - 2, f"md5 twin missed {N_PLANTED - len(md5_found)}"
    assert len(fast_found) >= N_PLANTED - 2, f"fast twin missed {N_PLANTED - len(fast_found)}"
    # and they agree up to banding noise: symmetric difference within the
    # combined miss budget (a systematic hash-family bug would blow this up)
    assert len(md5_found ^ fast_found) <= 4
