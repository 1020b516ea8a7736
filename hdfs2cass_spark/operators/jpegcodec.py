"""Built-in baseline JPEG codec — pure Python + numpy, spark-free.

Closes the JPEG gap in the multimodal codec family (netpbm + PNG in
mmcodec.py, WAV/PCM in wavcodec.py): DECODE of baseline DCT JPEG (SOF0/SOF1
— huffman, 8-bit, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling,
restart markers, multi-table DQT/DHT markers) and ENCODE of baseline
grayscale/RGB (4:4:4 or 4:2:0, quality-scaled Annex-K tables, optional
restart interval), written against the public ITU-T T.81 spec. Progressive
(SOF2), arithmetic coding, 12-bit precision and hierarchical modes raise
NotImplementedError loudly — silent garbage pixels would poison a training
set (the mmcodec contract).

Correctness over speed by design (the r11-verdict framing): entropy coding
is per-symbol Python, but the DCT/IDCT, quantization, upsampling and color
conversion are whole-image numpy — fine for the Arrow-batched mapInPandas
decode path at fixture scale; a production cluster would swap in a native
codec behind the same function signatures.

Determinism contract (the wav_audio_features precedent): quantization is
floor(x/q + 0.5) and the final sample reconstruction floor(x + 0.5) — both
reproducible by exact integer math for FLAT blocks (DC-only), which is what
the jpeg_image_features oracle row predicts analytically.

The reference (spotify/hdfs2cass) has no media surface; this module belongs
to the LLM-training-pipeline extension surface the project brief demands.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (bits-per-length[1..16], symbol values) — the K.3 typical tables. The
# decoder reads DHT from the stream, so file compatibility never depends on
# these; they only define what OUR encoder writes.
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def scaled_quant(base: list[int], quality: int) -> list[int]:
    """libjpeg-compatible quality scaling of a base table (integer-exact)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in base]


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c


# ---------------------------------------------------------------------------
# Bit I/O (with 0xFF byte stuffing)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_and_flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits per T.81


class _BitReader:
    """Entropy-segment reader: undoes 0xFF00 stuffing, surfaces RSTn
    markers at byte boundaries, stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-RST marker ends the scan

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 >= len(d):
                return False
            nxt = d[p + 1]
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker — consumed by sync_restart
            else:
                self.marker = nxt
                return False
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("truncated JPEG entropy segment")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expected: int) -> None:
        """Byte-align and consume the next RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise ValueError("expected restart marker, hit end of data")
        got = d[p + 1] - 0xD0
        if got != expected & 7:
            raise ValueError(f"restart marker out of sync: RST{got}")
        self.pos = p + 2


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol, canonical huffman per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    return {sym: (length, code) for (length, code), sym in _build_decode_table(bits, vals).items()}


def _decode_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _to_blocks(plane, n_by, n_bx):
    """(H, W) float plane, H = 8*n_by, W = 8*n_bx -> (n_by*n_bx, 8, 8)."""
    return (
        plane.reshape(n_by, 8, n_bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(plane, h8, w8):
    import numpy as np

    return np.pad(
        plane, ((0, h8 - plane.shape[0]), (0, w8 - plane.shape[1])), mode="edge"
    )


def encode_jpeg(
    px,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 -> baseline JFIF bytes.
    ``subsample`` writes 4:2:0 chroma; ``restart_interval`` > 0 emits DRI +
    RSTn markers every N MCUs (exercises the decoder's resync path)."""
    import numpy as np

    a = np.asarray(px)
    if a.dtype != np.uint8 or a.ndim not in (2, 3) or (a.ndim == 3 and a.shape[2] != 3):
        raise ValueError("encode_jpeg wants (H,W) or (H,W,3) uint8")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = a.ndim == 2
    ql = scaled_quant(QUANT_LUMA, quality)
    qc = scaled_quant(QUANT_CHROMA, quality)
    cmat = _dct_matrix()

    if gray:
        planes = [a.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qtab_of = [0]
    else:
        f = a.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsample:
            # 2x2 box average on an edge-padded even grid
            he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp, crp = _pad_to(cb, he, we), _pad_to(cr, he, we)
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtab_of = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component: pad plane to its MCU-aligned size, batch-DCT, quantize
    comp_q = []  # quantized coefficient blocks in raster order, per comp
    comp_nbx = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        n_bx, n_by = mcus_x * hi, mcus_y * vi
        pl = _pad_to(plane, n_by * 8, n_bx * 8)
        blocks = _to_blocks(pl, n_by, n_bx)
        coef = np.einsum("ux,nxy,vy->nuv", cmat, blocks, cmat)
        q = np.array(ql if qtab_of[ci] == 0 else qc, dtype=np.float64).reshape(8, 8)
        # floor(x/q + 0.5): the deterministic rounding the oracle predicts
        comp_q.append(np.floor(coef / q + 0.5).astype(np.int64))
        comp_nbx.append(n_bx)

    # --- entropy-coded segment ---
    enc_dc = [_build_encode_table(*DC_LUMA), _build_encode_table(*DC_CHROMA)]
    enc_ac = [_build_encode_table(*AC_LUMA), _build_encode_table(*AC_CHROMA)]
    wtr = _BitWriter()
    pred = [0] * len(planes)
    tbl_of = qtab_of  # luma tables for comp 0, chroma for the rest
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.pad_and_flush()
                wtr.out += bytes([0xFF, 0xD0 + (rst_idx & 7)])
                rst_idx += 1
                pred = [0] * len(planes)
            for ci in range(len(planes)):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        blk = comp_q[ci][
                            (my * vi + by) * comp_nbx[ci] + (mx * hi + bx)
                        ]
                        zz = blk.reshape(64)[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size = _category(diff)
                        ln, code = enc_dc[tbl_of[ci]][size]
                        wtr.write(code, ln)
                        if size:
                            wtr.write(diff if diff > 0 else diff + (1 << size) - 1, size)
                        run = 0
                        ac_tbl = enc_ac[tbl_of[ci]]
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_tbl[0xF0]  # ZRL
                                wtr.write(code, ln)
                                run -= 16
                            size = _category(v)
                            ln, code = ac_tbl[(run << 4) | size]
                            wtr.write(code, ln)
                            wtr.write(v if v > 0 else v + (1 << size) - 1, size)
                            run = 0
                        if run:
                            ln, code = ac_tbl[0x00]  # EOB
                            wtr.write(code, ln)
            mcu_count += 1
    wtr.pad_and_flush()

    # --- markers ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zz_ql = bytes(ql[ZIGZAG[i]] for i in range(64))
    zz_qc = bytes(qc[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_ql
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + zz_qc
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qtab_of[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, DC_LUMA) + dht(1, 0, AC_LUMA)
    if not gray:
        out += dht(0, 1, DC_CHROMA) + dht(1, 1, AC_CHROMA)
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tbl_of[ci] << 4) | tbl_of[ci]])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(b: bytes):
    """Baseline JPEG bytes -> (H, W) or (H, W, 3) uint8. Raises ValueError
    on malformed input and NotImplementedError on non-baseline modes."""
    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    sof = None
    comps = None
    scan = None

    # header truncation shows up as struct.error / IndexError / short-slice
    # unpacks deep in segment parsing; the module contract is ValueError on
    # malformed input (ADVICE r12), so normalize them here
    try:
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                raise ValueError(f"marker expected at offset {pos}")
            if b[pos + 1] == 0xFF:  # fill bytes before a marker are legal
                pos += 1
                continue
            marker = b[pos + 1]
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            body = b[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                raise ValueError(
                    f"truncated JPEG: marker 0xFF{marker:02X} declares {seglen - 2} "
                    f"body bytes, only {len(body)} present"
                )
            pos += 2 + seglen
            if marker == 0xDB:  # DQT (possibly several tables)
                o = 0
                while o < len(body):
                    pq, tq = body[o] >> 4, body[o] & 0xF
                    o += 1
                    if pq == 0:
                        tab = np.frombuffer(body[o : o + 64], dtype=np.uint8).astype(np.int64)
                        o += 64
                    else:
                        tab = np.frombuffer(body[o : o + 128], dtype=">u2").astype(np.int64)
                        o += 128
                    dz = np.empty(64, dtype=np.int64)
                    dz[ZIGZAG] = tab  # de-zigzag into natural order
                    qtabs[tq] = dz.reshape(8, 8)
            elif marker == 0xC4:  # DHT (possibly several tables)
                o = 0
                while o < len(body):
                    tc, th = body[o] >> 4, body[o] & 0xF
                    bits = list(body[o + 1 : o + 17])
                    n = sum(bits)
                    vals = list(body[o + 17 : o + 17 + n])
                    htabs[(tc, th)] = _build_decode_table(bits, vals)
                    o += 17 + n
            elif marker in (0xC0, 0xC1):  # SOF0/1: baseline (extended sequential)
                prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
                if prec != 8:
                    raise NotImplementedError(f"{prec}-bit JPEG not supported")
                comps = []
                for i in range(nc):
                    cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
                sof = (hh, ww)
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"non-baseline JPEG (SOF marker 0xFF{marker:02X} — progressive/"
                    "arithmetic/hierarchical) is not supported by the built-in decoder"
                )
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan = []
                for i in range(ns):
                    cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                    scan.append((cs, tt >> 4, tt & 0xF))
                break  # entropy data follows at `pos`
            # APPn / COM / anything else: skipped by seglen
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated JPEG header: {e}") from e
    if sof is None or comps is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w = sof
    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan JPEG not supported")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        c["td"], c["ta"] = td, ta
        order.append(c)

    if len(order) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — one data
        # unit per MCU in block-raster order over ceil(w/8) x ceil(h/8),
        # regardless of the SOF sampling factors (libjpeg does the same).
        # Using the interleaved h x v geometry here would desync the entropy
        # stream for a legal grayscale JPEG declaring e.g. 2x2 sampling.
        order[0]["h"] = order[0]["v"] = 1
        hmax = vmax = 1
        mcus_x = -(-w // 8)
        mcus_y = -(-h // 8)

    for c in order:
        c["nbx"] = mcus_x * c["h"]
        c["nby"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["nby"] * c["nbx"], 8, 8), dtype=np.int64)
        c["pred"] = 0

    r = _BitReader(b, pos)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.sync_restart(rst_idx)
                rst_idx += 1
                for c in order:
                    c["pred"] = 0
            for c in order:
                dc_tab = htabs.get((0, c["td"]))
                ac_tab = htabs.get((1, c["ta"]))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("scan uses an undefined huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _decode_symbol(r, dc_tab)
                        diff = _extend(r.receive(size), size) if size else 0
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, ac_tab)
                            rrrr, ssss = rs >> 4, rs & 0xF
                            if ssss == 0:
                                if rrrr == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(r.receive(ssss), ssss)
                            k += 1
                        blk = np.empty(64, dtype=np.int64)
                        blk[ZIGZAG] = zz
                        c["coef"][
                            (my * c["v"] + by) * c["nbx"] + (mx * c["h"] + bx)
                        ] = blk.reshape(8, 8)
            mcu_count += 1

    # dequantize + batch IDCT + stitch + upsample
    cmat = _dct_matrix()
    planes = []
    for c in order:
        q = qtabs.get(c["tq"])
        if q is None:
            raise ValueError(f"component uses undefined quant table {c['tq']}")
        deq = c["coef"].astype(np.float64) * q[None, :, :]
        # block = C.T @ F @ C  <=>  B[x,y] = sum_uv C[u,x] F[u,v] C[v,y]
        sp = np.einsum("ux,nuv,vy->nxy", cmat, deq, cmat)
        plane = (
            sp.reshape(c["nby"], c["nbx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["nby"] * 8, c["nbx"] * 8)
        )
        # floor(x + 0.5): the deterministic reconstruction rounding
        plane = np.floor(plane + 128.5)
        # upsample to full MCU grid then crop to (h, w)
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG not supported")
    y, cb, cr = planes
    # y is already +128-shifted by the reconstruction; chroma planes carry
    # the same shift, undone here (JFIF stores Cb/Cr centered at 128)
    cbc, crc = cb - 128.0, cr - 128.0
    r_ = y + 1.402 * crc
    g_ = y - 0.344136286 * cbc - 0.714136286 * crc
    b_ = y + 1.772 * cbc
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
