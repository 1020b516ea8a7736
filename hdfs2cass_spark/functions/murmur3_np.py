"""Vectorized Cassandra Murmur3 tokens (numpy).

Same algorithm as functions/murmur3.py (MurmurHash3 x64 128, seed 0, Cassandra's
signed-tail-byte quirk, empty-key -> MIN, Long.MIN normalization) but computed
for a whole Arrow batch at once:

  - keys are packed into one padded [n, ceil((maxlen+16)/16)*16] uint8 matrix;
    when the batch arrives as an Arrow binary/string array the contiguous data
    buffer + offsets are used directly (no per-row join, no per-row utf-8
    encode — Arrow strings are already utf-8 bytes)
  - the block loop runs max_blocks times VECTORIZED across all rows (masked),
    so cost is O(max_len/16) numpy passes per batch instead of per-row Python
  - the 0-15 byte tail is read as the row's two zero-padded little-endian u64
    words; Java's per-byte sign extension is applied in closed form: byte j of
    the correction is 0xFF iff an odd number of bytes below j have their sign
    bit set (a prefix-XOR-parity, 3 shift-xor passes), because
    ((long) b << 8j) for a negative byte fills every byte above j with FF

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
_SIGNS = np.uint64(0x8080808080808080)
_LOWBITS = np.uint64(0x0101010101010101)
_FF = np.uint64(0xFF)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(k: np.ndarray) -> np.ndarray:
    k ^= k >> np.uint64(33)
    k *= _F1
    k ^= k >> np.uint64(33)
    k *= _F2
    k ^= k >> np.uint64(33)
    return k


def _signed_tail_word(w: np.ndarray) -> np.ndarray:
    """Fold Java sign extension into a zero-padded LE tail word.

    The scalar spec XORs ``((long) byte) << 8*j`` per tail byte; for a byte
    with the sign bit set that fills bytes j+1.. with 0xFF. XOR-accumulated,
    byte j of the result differs from the plain word exactly when an odd
    number of lower bytes are signed — a prefix parity over the per-byte sign
    bits, computed with shift-doubling.
    """
    p = w & _SIGNS
    p ^= p << np.uint64(8)
    p ^= p << np.uint64(16)
    p ^= p << np.uint64(32)
    # strict prefix: byte j's parity must exclude byte j itself
    q = p << np.uint64(8)
    return w ^ (((q >> np.uint64(7)) & _LOWBITS) * _FF)


def _pack(keys) -> "tuple[np.ndarray, np.ndarray]":
    """Any batch of byte/str keys -> (lens[n] int64, data blob uint8[total]).

    Arrow-backed inputs (pandas Series, pyarrow Array) expose the packed blob
    directly; plain lists fall back to one bytes-join.
    """
    import pyarrow as pa

    if not isinstance(keys, (pa.Array, pa.ChunkedArray)):
        try:
            arr = pa.array(keys, from_pandas=True)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # mixed bytes/str batch: normalize per-row (rare path)
            arr = pa.array(
                [k.encode("utf-8") if isinstance(k, str) else k for k in keys],
                from_pandas=True,
            )
    else:
        arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    elif not pa.types.is_large_binary(arr.type):
        raise TypeError(f"murmur3_tokens: unsupported key type {arr.type}")
    # nulls contribute 0 bytes but keep their slot; fill_null normalizes the
    # offsets so diff() is the true per-row length
    if arr.null_count:
        arr = arr.fill_null(b"")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    lens = np.diff(offsets)
    blob = data[offsets[0] : offsets[-1]]
    return lens, blob


def murmur3_tokens(keys) -> np.ndarray:
    """Cassandra Murmur3Partitioner tokens for a batch of byte keys -> int64[n].

    Accepts a list of bytes/str/None, a pandas Series, or a pyarrow Array.
    """
    lens, blob = _pack(keys)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    maxlen = int(lens.max())
    # pad to a multiple of 16 so the uint64 block view is aligned; +16 so the
    # tail words (columns 2*nblocks, 2*nblocks+1) always exist
    width = ((maxlen // 16) + 1) * 16
    buf = np.zeros(n * width, dtype=np.uint8)
    starts = np.concatenate(([0], lens.cumsum()[:-1]))
    row_base = np.arange(n, dtype=np.int64) * width
    # ONE repeat: per-byte destination = global byte index - source row start
    # + destination row start
    buf[np.arange(len(blob), dtype=np.int64) + np.repeat(row_base - starts, lens)] = blob
    u64 = buf.view("<u8").reshape(n, width // 8)

    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    nblocks = (lens // 16).astype(np.int64)
    max_blocks = int(nblocks.max())

    with np.errstate(over="ignore"):
        for b in range(max_blocks):
            m = nblocks > b
            k1 = u64[:, 2 * b] * _C1
            k1 = _rotl(k1, 31)
            k1 *= _C2
            nh1 = h1 ^ k1
            nh1 = _rotl(nh1, 27)
            nh1 += h2
            nh1 = nh1 * np.uint64(5) + np.uint64(0x52DCE729)
            k2 = u64[:, 2 * b + 1] * _C2
            k2 = _rotl(k2, 33)
            k2 *= _C1
            nh2 = h2 ^ k2
            nh2 = _rotl(nh2, 31)
            nh2 += nh1
            nh2 = nh2 * np.uint64(5) + np.uint64(0x38495AB5)
            h1 = np.where(m, nh1, h1)
            h2 = np.where(m, nh2, h2)

        # tail: the two zero-padded LE words at the first non-block offset
        rows = np.arange(n, dtype=np.int64)
        flat = u64.reshape(-1)
        w1 = flat[rows * (width // 8) + 2 * nblocks]
        w2 = flat[rows * (width // 8) + 2 * nblocks + 1]
        tail_len = lens - nblocks * 16

        k2 = _signed_tail_word(w2)
        k2 *= _C2
        k2 = _rotl(k2, 33)
        k2 *= _C1
        h2 = np.where(tail_len > 8, h2 ^ k2, h2)

        k1 = _signed_tail_word(w1)
        k1 *= _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        h1 = np.where(tail_len > 0, h1 ^ k1, h1)

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
