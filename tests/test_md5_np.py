"""Differential tests: vectorized MD5 token batch vs the scalar spec.

The scalar md5_token (functions/md5token.py) is the readable reference for
Cassandra's RandomPartitioner getToken (abs of the signed big-endian 128-bit
digest, empty key -> 0). The numpy batch path (functions/md5_np.py) must match
it bit-for-bit — token string, zero-padding, and bucket division."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hdfs2cass_spark.functions.md5_np import md5_token_strings, md5_tokens_and_buckets
from hdfs2cass_spark.functions.md5token import (
    TOKEN_WIDTH,
    md5_token,
    range_per_bucket_md5,
)


@given(
    st.lists(
        st.one_of(st.none(), st.binary(max_size=64), st.text(max_size=32)),
        min_size=1,
        max_size=64,
    ),
    st.sampled_from([1, 2, 3, 8, 32, 257]),
)
@settings(max_examples=200, deadline=None)
def test_batch_matches_scalar(keys, num_buckets):
    rp = range_per_bucket_md5(num_buckets)
    toks, buckets = md5_tokens_and_buckets(
        pd.Series(keys, dtype=object), rp, num_buckets
    )
    for i, k in enumerate(keys):
        t = md5_token(k)
        assert toks[i] == str(t).zfill(TOKEN_WIDTH)
        assert buckets[i] == t // rp


def test_token_string_edges():
    # sign-bit digest (md5("foo") starts 0xac -> negative, abs = 2^128 - x),
    # all-zero-prefix padding, empty-key minimum
    toks, lens = md5_token_strings([b"foo", b"", None, b"\x00"])
    assert toks[0] == b"110673303387115207421586718101067225896"
    assert toks[1] == b"0" * 39
    assert toks[2] == b"0" * 39
    assert len(toks[3]) == 39
    assert list(lens) == [3, 0, 0, 1]


def test_bucket_boundaries_exact():
    # tokens exactly on k*rangePerReducer boundaries must land in bucket k
    # (searchsorted side='right' == floor division)
    rp = range_per_bucket_md5(8)
    rng = np.random.default_rng(3)
    keys = [bytes(rng.integers(0, 256, 12, dtype=np.uint8)) for _ in range(500)]
    toks, buckets = md5_tokens_and_buckets(pd.Series(keys, dtype=object), rp, 8)
    for i, k in enumerate(keys):
        assert buckets[i] == md5_token(k) // rp
