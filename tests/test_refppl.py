"""Reference-perplexity bucketing (plans/refppl.py): OOV flooring, model
provenance (fit on the reference split ONLY), and bucket ordering on
planted docs. The NTILE-equivalence of the histogram-rank bucketing is
continuously asserted by the DuckDB oracle comparison
(tests/test_catalog_oracle.py runs the declared query against its NTILE
oracle on every pytest run)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hdfs2cass_spark.plans.refppl import OOV_LOGP
from hdfs2cass_spark.plans.registry import CATALOG

# doc_id % 3 == 0 -> reference split (crossdedup REF_MOD convention)
DOCS = [
    # reference docs: only 'x y' and 'y x' transitions exist in the model
    (0, "x y x y x y"),
    (3, "y x y x"),
    (6, "x y x y"),
    # new doc 1: transitions the reference knows -> no OOV, best score
    (1, "x y x y x"),
    # new doc 2: half-known ('x y'), half-unknown ('y q') -> partial OOV
    (2, "x y q"),
    # new doc 4: fully reference-unseen transitions -> every bigram floored
    (4, "q r q r"),
]


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("refppl_docs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
                "text": pa.array([r[1] for r in DOCS], pa.string()),
                "lang": pa.array(["en"] * len(DOCS), pa.string()),
                "source": pa.array(["t"] * len(DOCS), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in DOCS], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_ref_fit_oov_floor_and_bucket_order(spark, planted_sf):
    rows = {
        r["doc_id"]: r
        for r in CATALOG["ref_perplexity_buckets"].fn(spark, planted_sf).collect()
    }
    # only NEW docs are scored; reference docs never appear
    assert set(rows) == {1, 2, 4}
    # doc 1: all 4 transitions known to the reference model
    assert rows[1]["n_bigrams"] == 4 and rows[1]["oov_bigrams"] == 0
    # doc 2: 'x>y' known, 'y>q' unseen
    assert rows[2]["n_bigrams"] == 2 and rows[2]["oov_bigrams"] == 1
    # doc 4: every transition unseen -> exactly the OOV floor
    assert rows[4]["oov_bigrams"] == rows[4]["n_bigrams"] == 3
    assert rows[4]["avg_logprob"] == pytest.approx(OOV_LOGP)
    # scores order by reference-likelihood: known > partial > gibberish,
    # and the terciles follow (3 docs -> one per bucket)
    assert rows[1]["avg_logprob"] > rows[2]["avg_logprob"] > rows[4]["avg_logprob"]
    assert (rows[1]["bucket"], rows[2]["bucket"], rows[4]["bucket"]) == (1, 2, 3)


def test_buckets_are_terciles_per_lang(spark, sf_dir):
    """On the fixture corpus the per-language bucket sizes must match
    NTILE(3)'s ceil/floor split exactly (the closed-form arithmetic)."""
    from collections import Counter

    rows = CATALOG["ref_perplexity_buckets"].fn(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], Counter())[r["bucket"]] += 1
    assert by_lang
    for lang, c in by_lang.items():
        n = sum(c.values())
        q, rem = divmod(n, 3)
        want = [q + (1 if rem >= i else 0) for i in (1, 2, 3)]
        assert [c.get(b, 0) for b in (1, 2, 3)] == want, (lang, c, want)
