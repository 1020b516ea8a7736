"""Vectorized Cassandra Murmur3 tokens (numpy).

Same algorithm as functions/murmur3.py (MurmurHash3 x64 128, seed 0, Cassandra's
signed-tail-byte quirk, empty-key -> MIN, Long.MIN normalization) but computed
for a whole Arrow batch at once:

  - keys are packed into one padded [n, ceil(maxlen/16)*16] uint8 matrix
  - the block loop runs max_blocks times VECTORIZED across all rows (masked),
    so cost is O(max_len/16) numpy passes per batch instead of per-row Python
  - the 0-15 byte tail is gathered with fancy indexing and folded with masked
    shifts (int8 view gives Java's sign extension for free)

Differentially tested against the scalar implementation on random keys
(tests/test_murmur3.py); the scalar version remains the readable spec.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_MIN = np.int64(-(2**63))
_MAX = np.int64(2**63 - 1)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(k: np.ndarray) -> np.ndarray:
    k ^= k >> np.uint64(33)
    k *= _F1
    k ^= k >> np.uint64(33)
    k *= _F2
    k ^= k >> np.uint64(33)
    return k


def murmur3_tokens(keys: "list[bytes | None]") -> np.ndarray:
    """Cassandra Murmur3Partitioner tokens for a batch of byte keys -> int64[n]."""
    n = len(keys)
    lens = np.fromiter(
        (0 if k is None else len(k) for k in keys), dtype=np.int64, count=n
    )
    if n == 0:
        return np.empty(0, dtype=np.int64)
    maxlen = int(lens.max())
    # pad to a multiple of 16 so the uint64 block view is aligned; +16 so the
    # tail gather below never indexes past the end
    width = ((maxlen // 16) + 2) * 16
    # pack all keys with ONE join + vectorized scatter — a per-row copy loop
    # costs as much as the pure-Python hash itself
    blob = np.frombuffer(
        b"".join(k if k else b"" for k in keys), dtype=np.uint8
    )
    buf = np.zeros(n * width, dtype=np.uint8)
    starts = np.concatenate(([0], lens.cumsum()[:-1]))
    within = np.arange(len(blob), dtype=np.int64) - np.repeat(starts, lens)
    buf[np.repeat(np.arange(n, dtype=np.int64) * width, lens) + within] = blob
    buf = buf.reshape(n, width)

    u64 = buf.view("<u8")  # [n, width/8] little-endian blocks
    i8 = buf.view(np.int8)  # sign-extended byte view (Java (long) byte cast)

    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    nblocks = (lens // 16).astype(np.int64)
    max_blocks = int(nblocks.max())

    with np.errstate(over="ignore"):
        for b in range(max_blocks):
            m = nblocks > b
            k1 = u64[:, 2 * b].copy()
            k2 = u64[:, 2 * b + 1].copy()
            k1 *= _C1
            k1 = _rotl(k1, 31)
            k1 *= _C2
            nh1 = h1 ^ k1
            nh1 = _rotl(nh1, 27)
            nh1 += h2
            nh1 = nh1 * np.uint64(5) + np.uint64(0x52DCE729)
            k2 *= _C2
            k2 = _rotl(k2, 33)
            k2 *= _C1
            nh2 = h2 ^ k2
            nh2 = _rotl(nh2, 31)
            nh2 += nh1
            nh2 = nh2 * np.uint64(5) + np.uint64(0x38495AB5)
            h1 = np.where(m, nh1, h1)
            h2 = np.where(m, nh2, h2)

        # tail: up to 15 bytes at offset nblocks*16, sign-extended
        tail_start = nblocks * 16
        tail_len = lens - tail_start
        pos = tail_start[:, None] + np.arange(16)[None, :]  # [n,16], in-bounds (padding)
        tb = i8[np.arange(n)[:, None], pos].astype(np.int64)  # signed bytes
        valid = np.arange(16)[None, :] < tail_len[:, None]
        tb = np.where(valid, tb, 0).astype(np.uint64)

        k1 = np.zeros(n, dtype=np.uint64)
        k2 = np.zeros(n, dtype=np.uint64)
        for i in range(15, 7, -1):  # bytes 8..15 -> k2
            k2 ^= tb[:, i] << np.uint64((i - 8) * 8)
        for i in range(7, -1, -1):  # bytes 0..7 -> k1
            k1 ^= tb[:, i] << np.uint64(i * 8)

        has_k2 = tail_len > 8
        k2 *= _C2
        k2 = _rotl(k2, 33)
        k2 *= _C1
        h2 = np.where(has_k2, h2 ^ k2, h2)

        has_k1 = tail_len > 0
        k1 *= _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        h1 = np.where(has_k1, h1 ^ k1, h1)

        h1 ^= lens.astype(np.uint64)
        h2 ^= lens.astype(np.uint64)
        h1 += h2
        h2 += h1
        h1 = _fmix(h1)
        h2 = _fmix(h2)
        h1 += h2

    tok = h1.view(np.int64).copy()
    tok[tok == _MIN] = _MAX  # Murmur3Partitioner.normalize
    tok[lens == 0] = _MIN  # empty key -> minimum token
    return tok
