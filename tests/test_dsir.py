"""Semantics tests for DSIR importance resampling (plans/dsir.py).

The differential oracle (test_catalog_oracle.py / dress rehearsal) proves
cross-engine exactness; these prove the operator MEANS what DSIR claims:
documents written in the target domain's vocabulary outrank off-domain
documents, the sample is deterministic, and the plan is the scale shape
(broadcast 256-row model, TakeOrderedAndProject top-k — no corpus sort).
"""

from __future__ import annotations

import pytest

from hdfs2cass_spark.plans import CATALOG
from hdfs2cass_spark.plans.dsir import dsir_weights_df

TARGET_WORDS = "alpha beta gamma delta epsilon zeta eta theta"
OTHER_WORDS = "zork quux blarg fnord wibble wobble flim flam"


def _corpus(spark):
    rows = []
    # target domain: vocabulary A
    for i in range(5):
        rows.append((i, TARGET_WORDS, "src1"))
    # raw pool: vocabulary B
    for i in range(5, 15):
        rows.append((i, OTHER_WORDS, "raw"))
    # the probe: a RAW doc written in the target vocabulary
    rows.append((99, TARGET_WORDS, "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_target_vocabulary_outranks(spark):
    d = _corpus(spark)
    out = {r.doc_id: r for r in dsir_weights_df(d, k=16).collect()}
    # every vocabulary-A doc (target members AND the raw probe) must carry a
    # strictly higher log weight than every vocabulary-B doc
    a_w = [out[i].log_weight for i in list(range(5)) + [99]]
    b_w = [out[i].log_weight for i in range(5, 15)]
    assert min(a_w) > max(b_w)
    # ... and with k = 6, ONLY the vocabulary-A docs are resampled (the
    # Gumbel noise is +-~3 while the weight gap here is tens of nats)
    picked = sorted(r.doc_id for r in dsir_weights_df(d, k=6).collect())
    assert picked == [0, 1, 2, 3, 4, 99]


def test_dsir_is_deterministic(spark):
    d = _corpus(spark)
    r1 = [tuple(r) for r in dsir_weights_df(d, k=8).collect()]
    r2 = [tuple(r) for r in dsir_weights_df(d, k=8).collect()]
    assert r1 == r2


def test_dsir_plan_shape(spark, sf_dir):
    df = CATALOG["dsir_importance_weights"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    # top-k via per-partition heaps, never a corpus-wide sort
    assert "TakeOrderedAndProject" in p
    # the 256-row model joins back as a broadcast; the corpus is never the
    # build side of anything
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_dsir_rank_is_dense_prefix(spark, sf_dir):
    rows = CATALOG["dsir_importance_weights"].fn(spark, sf_dir).collect()
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    # sample_key order and rnk order agree (ties broken by doc_id)
    by_rnk = sorted(rows, key=lambda r: r.rnk)
    keys = [r.sample_key for r in by_rnk]
    assert keys == sorted(keys, reverse=True)
