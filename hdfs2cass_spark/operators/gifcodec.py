"""Built-in GIF (87a/89a) codec — pure Python + numpy, spark-free.

Closes the last common-crawl image format in the multimodal family
(netpbm + PNG in mmcodec.py, baseline JPEG in jpegcodec.py, WAV/PCM in
wavcodec.py): DECODE of GIF87a/GIF89a — variable-width LSB-first LZW with
deferred clear, global + local color tables (including non-power-of-two
logical palettes padded to 2^(n+1) physical entries), Adam-style 4-pass row
interlace, Graphic Control transparency, and multi-frame compositing with
disposal methods 0-3 — and ENCODE of indexed frames (real LZW compression
with dictionary reset at 4096, optional interlace / transparency / offsets /
disposal) so round trips are testable with no external codec, written
against the public GIF89a specification (CompuServe, 1990). Unlike JPEG the
whole format is LOSSLESS, so round trips are bit-exact by construction and
the oracle row can predict decoded pixels without excluded cases.

Compositing contract (documented determinism, matching the common browser/
PIL behavior where the spec is loose): the canvas starts as the background
color resolved through the global color table (index 0 if no GCT);
disposal 2 restores the frame rectangle to that background color;
disposal 3 restores the pre-frame canvas; transparent pixels leave the
underlying canvas untouched.

The reference (spotify/hdfs2cass) has no media surface; this module belongs
to the LLM-training-pipeline extension surface the project brief demands.
"""

from __future__ import annotations

import struct

# row order of the GIF 4-pass interlace: (first row, step)
INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE = 1 << 12  # LZW dictionary hard cap per the spec


def interlace_order(height: int) -> list[int]:
    """The canvas row index receiving each successively-decoded raster row."""
    rows = []
    for first, step in INTERLACE_PASSES:
        rows.extend(range(first, height, step))
    return rows


# ---------------------------------------------------------------------------
# LZW (variable-width codes, LSB-first bit packing)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Concatenated sub-block bytes -> exactly ``expected`` palette indices."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or code > end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(
            f"GIF LZW stream ended at {len(out)} of {expected} pixels"
        )
    return bytes(out[:expected])


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += size
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> None:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Palette indices -> LZW bytes (real compression, dict reset at 4096).

    The encoder's dictionary runs one step ahead of the decoder's (the
    decoder materializes entry N while reading the code AFTER the one whose
    emission created it), so the width bump fires when the last assigned
    code reaches 2^size — mirrored by the decoder's len(table)==1<<size.
    """
    clear = 1 << min_code_size
    end = clear + 1
    w = _LsbWriter()
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w.write(clear, code_size)
    buf = b""
    for byte in indices:
        cand = buf + bytes([byte])
        if cand in table:
            buf = cand
            continue
        w.write(table[buf], code_size)
        if next_code < _MAX_CODE:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            w.write(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        buf = bytes([byte])
    if buf:
        w.write(table[buf], code_size)
    w.write(end, code_size)
    w.flush()
    return bytes(w.out)


def _sub_blocks(data: bytes) -> bytes:
    """Pack bytes into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _color_table_bits(n_colors: int) -> int:
    """Physical GIF color tables hold 2^(bits) entries, bits in [1, 8]."""
    bits = max(1, (n_colors - 1).bit_length())
    if not 1 <= bits <= 8:
        raise ValueError(f"palette of {n_colors} colors does not fit GIF")
    return bits


def _pack_palette(palette) -> tuple[bytes, int]:
    import numpy as np

    p = np.asarray(palette, dtype=np.uint8)
    if p.ndim != 2 or p.shape[1] != 3 or not len(p):
        raise ValueError("palette must be (n, 3) uint8")
    bits = _color_table_bits(len(p))
    padded = np.zeros((1 << bits, 3), np.uint8)
    padded[: len(p)] = p
    return padded.tobytes(), bits


def encode_gif(
    frames,
    palette,
    screen_size=None,
    interlace: bool = False,
    frame_meta=None,
    background: int = 0,
) -> bytes:
    """Indexed frames -> GIF89a bytes.

    ``frames``: list of uint8 (h, w) index arrays, or (indices, left, top)
    tuples for offset sub-frames. ``palette``: global (n, 3) uint8 color
    table (logical size; physically padded to 2^bits). ``frame_meta``:
    optional per-frame dicts with ``transparent`` (index or None),
    ``disposal`` (0-3), ``delay_cs``, ``palette`` (local color table
    overriding the global one for that frame).
    """
    import numpy as np

    norm = []
    for f in frames:
        if isinstance(f, tuple):
            idx, left, top = f
        else:
            idx, left, top = f, 0, 0
        idx = np.asarray(idx, dtype=np.uint8)
        if idx.ndim != 2:
            raise ValueError("frame indices must be 2-D")
        norm.append((idx, int(left), int(top)))
    if not norm:
        raise ValueError("GIF needs at least one frame")
    gct, gbits = _pack_palette(palette)
    if screen_size is None:
        sw = max(idx.shape[1] + left for idx, left, _ in norm)
        sh = max(idx.shape[0] + top for idx, _, top in norm)
    else:
        sw, sh = screen_size
    meta = frame_meta or [{} for _ in norm]
    if len(meta) != len(norm):
        raise ValueError("frame_meta length must match frames")

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | ((gbits - 1) << 4) | (gbits - 1), background, 0])
    out += gct
    if len(norm) > 1:
        # Netscape looping extension — standard for multi-frame GIFs
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for (idx, left, top), m in zip(norm, meta):
        h, w = idx.shape
        transparent = m.get("transparent")
        disposal = int(m.get("disposal", 0))
        delay = int(m.get("delay_cs", 0))
        if transparent is not None or disposal or delay:
            packed = (disposal << 2) | (1 if transparent is not None else 0)
            out += b"\x21\xf9\x04" + bytes([packed]) + struct.pack("<H", delay)
            out += bytes([transparent or 0, 0])
        local = m.get("palette")
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
        if local is not None:
            lct, lbits = _pack_palette(local)
            out += bytes([0x80 | (0x40 if interlace else 0) | (lbits - 1)])
            out += lct
            table_bits = lbits
        else:
            out += bytes([0x40 if interlace else 0])
            table_bits = gbits
        if int(idx.max(initial=0)) >= (1 << table_bits):
            raise ValueError("frame index exceeds its color table")
        if interlace:
            idx = idx[np.array(interlace_order(h), dtype=np.int64)]
        mcs = max(2, table_bits)
        out += bytes([mcs])
        out += _sub_blocks(_lzw_encode(idx.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def parse_gif(b: bytes):
    """GIF bytes -> (width, height, frames) where ``frames`` is the list of
    fully-composited uint8 (height, width, 3) RGB canvases, one per image
    descriptor, honoring interlace, local palettes, transparency and
    disposal 0-3. Raises ValueError on malformed input."""
    import numpy as np

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    try:
        return _parse_gif_inner(b, np)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated GIF: {e}") from e


def _skip_sub_blocks(b: bytes, pos: int) -> int:
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF (unterminated sub-blocks)")
        n = b[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _read_sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF (unterminated sub-blocks)")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(b):
            raise ValueError("truncated GIF data sub-block")
        out += b[pos : pos + n]
        pos += n


def _parse_gif_inner(b: bytes, np):
    sw, sh = struct.unpack_from("<HH", b, 6)
    packed, background, _aspect = b[10], b[11], b[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    if gct is not None and background < len(gct):
        bg_rgb = gct[background]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()

    frames: list = []
    transparent = None
    disposal = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF (no trailer)")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("truncated GIF extension")
            label = b[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control
                data, pos = _read_sub_blocks(b, pos)
                if len(data) < 4:
                    raise ValueError("short graphic control extension")
                flags = data[0]
                disposal = (flags >> 2) & 0x7
                transparent = data[3] if flags & 0x1 else None
            else:  # application / comment / plain text: skip
                pos = _skip_sub_blocks(b, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X} at {pos - 1}")
        left, top, w, h = struct.unpack_from("<HHHH", b, pos)
        fpacked = b[pos + 8]
        pos += 9
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame rectangle outside logical screen")
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(b[pos : pos + 3 * n], np.uint8)
            if len(lct) != 3 * n:
                raise ValueError("truncated GIF local color table")
            table = lct.reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame with neither local nor global palette")
        if pos >= len(b):
            raise ValueError("truncated GIF (missing LZW code size)")
        mcs = b[pos]
        pos += 1
        data, pos = _read_sub_blocks(b, pos)
        idx = np.frombuffer(_lzw_decode(data, mcs, w * h), np.uint8)
        idx = idx.reshape(h, w)
        if fpacked & 0x40:  # interlaced: decoded rows land per the 4 passes
            deinter = np.empty_like(idx)
            deinter[np.array(interlace_order(h), dtype=np.int64)] = idx
            idx = deinter
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index outside its color table")

        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = table[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return sw, sh, frames
