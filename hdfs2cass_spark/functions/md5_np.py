"""Vectorized RandomPartitioner (MD5 / BigIntegerToken) batch tokens.

Same semantics as functions/md5token.py:md5_token (the readable scalar spec —
abs of the signed big-endian 128-bit digest, empty key -> 0) but the only
per-row Python work is the md5 digest call itself; everything downstream is
numpy over the whole Arrow batch:

  - abs(two's complement) on the digest's two 64-bit words
  - the 39-digit decimal token string via 16-bit-limb schoolbook division by
    10^13 (splits the 128-bit value into three u64-sized 13-digit chunks — a
    16-bit limb keeps every intermediate under 2^60) and a broadcast
    divmod-by-powers-of-10 to a [n, 39] ascii digit matrix viewed as S39
  - bucket = token // rangePerReducer via searchsorted against the B
    precomputed bucket-boundary strings — zero-padded decimal compares
    lexicographically in numeric order, so no 128-bit division per row

Differentially tested against the scalar spec (tests/test_partitioning.py,
tests/test_properties.py, tests/test_md5_np.py).

Measured (200k short keys, one core): ~750k keys/s vs ~425k for the old
per-row loop; the md5 digest call itself is now ~half the runtime (1.6M
digests/s is the per-core ceiling with Python's hashlib — numpy prototypes of
full 128-bit bucket division were SLOWER than this split because u64 integer
division doesn't vectorize). The Murmur3 batch path runs ~2.4M keys/s/core;
RandomPartitioner is the legacy ring, so a ~3x gap is acceptable.
"""

from __future__ import annotations

import hashlib

import numpy as np

_D13 = np.uint64(10**13)  # 13-digit chunk divisor, fits 44 bits
_M16 = np.uint64(0xFFFF)
_P10 = (10 ** np.arange(12, -1, -1, dtype=np.int64)).astype(np.uint64)  # 10^12..10^0


def _digest_blob(keys) -> "tuple[bytes, np.ndarray]":
    """Per-row md5 digests concatenated into one blob + key lengths."""
    md5 = hashlib.md5
    it = keys.to_numpy() if hasattr(keys, "to_numpy") else keys
    norm = [
        b"" if k is None else (k.encode("utf-8") if isinstance(k, str) else k)
        for k in it
    ]
    lens = np.fromiter(map(len, norm), dtype=np.int64, count=len(norm))
    return b"".join([md5(k).digest() for k in norm]), lens


def _div_limbs(limbs: "list[np.ndarray]", d: np.uint64) -> "tuple[list[np.ndarray], np.ndarray]":
    """Schoolbook divide a big-endian 16-bit-limb integer by scalar d.

    Returns (quotient limbs, remainder). Intermediates stay < 2^60 for
    d < 2^44, so plain u64 arithmetic is exact.
    """
    q = []
    r = np.zeros_like(limbs[0])
    for l in limbs:
        cur = (r << np.uint64(16)) | l
        qi = cur // d
        r = cur - qi * d
        q.append(qi)
    return q, r


def _chunk_digits(c: np.ndarray) -> np.ndarray:
    """u64 chunk (< 10^13) -> [n, 13] ascii digit matrix.

    Runs the divmod cascade in float64, which IS exact here: values stay under
    2^53, c/10 is exactly k when 10 | c (the quotient is representable), and
    otherwise the true fractional part is >= 0.1 while the rounding error is
    < 2^-9 — floor can never flip. Float division vectorizes (SIMD); u64
    division does not (~20x slower measured).
    """
    f = c.astype(np.float64)
    out = np.empty((len(c), 13), dtype=np.uint8)
    for j in range(12, -1, -1):
        q = np.floor(f / 10.0)
        out[:, j] = (f - 10.0 * q).astype(np.uint8) + np.uint8(48)
        f = q
    return out


def md5_token_strings(keys) -> "tuple[np.ndarray, np.ndarray]":
    """Batch of byte/str keys -> (S39 zero-padded decimal tokens, key lens)."""
    blob, lens = _digest_blob(keys)
    toks = _token_strings_from_blob(blob, len(lens))
    if len(lens):
        toks[lens == 0] = b"0" * 39  # empty key -> MINIMUM (RandomPartitioner.ZERO)
    return toks, lens


def _token_strings_from_blob(blob: bytes, n: int) -> np.ndarray:
    """Concatenated 16-byte digests -> S39 zero-padded decimal tokens.

    An all-zero digest yields token 0 exactly — callers that map empty/NULL
    keys to the zero digest get the RandomPartitioner MINIMUM for free.
    """
    if n == 0:
        return np.empty(0, dtype="S39")
    d = np.frombuffer(blob, dtype=">u8").reshape(n, 2)
    hi = d[:, 0].astype(np.uint64)
    lo = d[:, 1].astype(np.uint64)
    with np.errstate(over="ignore"):
        neg = (hi >> np.uint64(63)).astype(bool)
        lo_abs = np.where(neg, (~lo) + np.uint64(1), lo)
        hi_abs = np.where(neg, ~hi + (lo == np.uint64(0)), hi)

        limbs = [
            hi_abs >> np.uint64(48),
            (hi_abs >> np.uint64(32)) & _M16,
            (hi_abs >> np.uint64(16)) & _M16,
            hi_abs & _M16,
            lo_abs >> np.uint64(48),
            (lo_abs >> np.uint64(32)) & _M16,
            (lo_abs >> np.uint64(16)) & _M16,
            lo_abs & _M16,
        ]
        q1, c0 = _div_limbs(limbs, _D13)  # low 13 digits
        q2, c1 = _div_limbs(q1, _D13)  # mid 13 digits
        c2 = q2[0]
        for l in q2[1:]:  # top chunk < 2^41 — the fold never overflows
            c2 = (c2 << np.uint64(16)) | l

        digits = np.concatenate(
            [_chunk_digits(c2), _chunk_digits(c1), _chunk_digits(c0)], axis=1
        )
    return np.ascontiguousarray(digits).view("S39").ravel()


def _bucketize(toks: np.ndarray, range_per: int, num_buckets: int) -> np.ndarray:
    bounds = np.array(
        [str(k * range_per).zfill(39).encode() for k in range(1, num_buckets)],
        dtype="S39",
    )
    return np.searchsorted(bounds, toks, side="right").astype(np.int32)


def md5_tokens_and_buckets(keys, range_per: int, num_buckets: int):
    """Batch keys -> (token strings U39, bucket int32) matching the scalar
    token // rangePerReducer, via boundary-string searchsorted."""
    toks, _lens = md5_token_strings(keys)
    return toks.astype("U39"), _bucketize(toks, range_per, num_buckets)


def md5_tokens_and_buckets_from_digests(digests, range_per: int, num_buckets: int):
    """Batch of 16-byte md5 DIGESTS -> (token strings U39, bucket int32).

    The fast path: the digest is computed JVM-side (codegen'd ``md5()``), so
    nothing here runs per row in Python — ``b"".join`` over fixed-width bytes
    is C-speed and everything after is the same whole-batch numpy as the
    key-based path. Empty/NULL keys arrive as the all-zero digest (the caller
    maps them), which yields token 0 == RandomPartitioner.ZERO exactly.
    """
    it = digests.to_numpy() if hasattr(digests, "to_numpy") else digests
    blob = b"".join(it)
    n = len(it)
    if len(blob) != 16 * n:
        raise ValueError("md5 digests must be exactly 16 bytes each")
    toks = _token_strings_from_blob(blob, n)
    return toks.astype("U39"), _bucketize(toks, range_per, num_buckets)
