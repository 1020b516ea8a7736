"""Pure-Python image codec helpers for the multimodal operators.

Spark-free by design: the mapInPandas bodies in operators/multimodal.py bind
these functions into their closures and register THIS module for
pickle-by-value (functions/shippable.py), so executors that have never heard
of the package can still run the real-decode branch.

Three formats decode identically whether or not PIL is installed:
  - netpbm (binary PGM ``P5`` / PPM ``P6`` — the layout ffmpeg's image2pipe
    emits): header parse + raw samples
  - PNG (8- and 16-bit, plain or Adam7-interlaced, all color types, all
    five scanline filters, CRC-checked): stdlib zlib inflate + numpy
    unfiltering, palette expanded
  - JPEG, baseline AND progressive (SOF0/1/2, gray + YCbCr
    4:4:4/4:2:2/4:2:0, restart markers, successive approximation): the
    built-in huffman + batch-IDCT decoder in jpegcodec.py
  - GIF87a/89a (LZW, interlace, local palettes, transparency, multi-frame
    disposal compositing): the built-in decoder in gifcodec.py
PIL extends coverage to everything else (sub-byte-depth PNG, TIFF,
arithmetic-coded JPEG, ...) when importable; without it those raise
loudly.
"""

from __future__ import annotations

# module-level so the bindings travel INSIDE mmcodec's pickled globals when
# this module ships by value (an in-function `from . import jpegcodec` would
# re-run package import machinery on a worker that lacks the package)
from . import gifcodec, jpegcodec  # noqa: E402

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def pil_image_module():
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency gate

        return Image
    except ImportError:
        return None


def parse_netpbm(b: bytes, offset: int = 0):
    """Parse ONE binary netpbm image (P5 gray / P6 rgb, maxval <= 255) at
    ``b[offset:]``. Returns (width, height, channels, pixels uint8[h, w, ch],
    end_offset). Raises ValueError on malformed input — a corrupt payload
    must fail loudly, not emit garbage features."""
    import numpy as np

    magic = b[offset : offset + 2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload (magic {magic!r})")
    channels = 1 if magic == b"P5" else 3
    pos = offset + 2
    fields: list[int] = []
    while len(fields) < 3:
        if pos >= len(b):
            raise ValueError("truncated netpbm header")
        c = b[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":  # comment to end of line
            nl = b.find(b"\n", pos)
            pos = len(b) if nl < 0 else nl + 1
        elif c.isdigit():
            end = pos
            while end < len(b) and b[end : end + 1].isdigit():
                end += 1
            fields.append(int(b[pos:end]))
            pos = end
        else:
            raise ValueError(f"malformed netpbm header byte {c!r}")
    width, height, maxval = fields
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported netpbm maxval {maxval} (1-byte samples only)")
    pos += 1  # exactly one whitespace byte separates header from raster
    n = width * height * channels
    raster = b[pos : pos + n]
    if len(raster) != n:
        raise ValueError("truncated netpbm raster")
    px = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, channels)
    return width, height, channels, px, pos + n


def encode_netpbm(px, maxval: int = 255) -> bytes:
    """uint8[h, w, ch] -> binary P5/P6 bytes (the parse_netpbm inverse)."""
    h, w, ch = px.shape
    magic = b"P5" if ch == 1 else b"P6"
    return magic + f"\n{w} {h}\n{maxval}\n".encode() + px.tobytes()


PNG_SIG = b"\x89PNG\r\n\x1a\n"


# Adam7 interlace pass grid: (x0, y0, dx, dy) per the PNG spec
ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(arr, ph: int, stride: int, bpp: int):
    """Per-(sub-)image scanline unfiltering: arr is uint8[ph, stride+1]
    (filter byte + filtered bytes per row); returns uint8[ph, stride].
    ``bpp`` is bytes-per-pixel — the spec's "left" reaches bpp bytes back,
    which is what makes the same loop serve 8- and 16-bit samples."""
    import numpy as np

    filters, out = arr[:, 0], np.zeros((ph, stride), np.int32)
    for y in range(ph):
        f, rec = filters[y], arr[y, 1:].astype(np.int32)
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.int32)
        if f == 0:
            pass
        elif f == 2:  # Up — whole-row vectorized
            rec = (rec + prev) & 0xFF
        elif f == 1:  # Sub: x += left(recon) — sequential in x
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                up = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = rec
    return out.astype(np.uint8)


def parse_png(b: bytes):
    """Decode ONE PNG (RFC 2083 / W3C spec) with the stdlib + numpy only:
    8- and 16-bit depth, color types gray/RGB/palette/gray+alpha/RGBA, all
    five scanline filters, Adam7 interlace, CRC-checked chunks. Returns
    (width, height, channels, pixels[h, w, ch]) — uint8 for depth 8 (with
    palettes expanded to RGB), uint16 for depth 16. Sub-byte depths (1/2/4)
    raise ValueError (decode_image falls back to PIL for those when it is
    installed) — a corrupt payload must fail loudly, not emit garbage
    features."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 12 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        if pos + 12 + ln > len(b):
            # a length-inflated/truncated chunk must raise the designed
            # ValueError (callers catch it for the PIL fallback), not a
            # struct.error from an empty CRC slice (review round 11)
            raise ValueError(f"truncated PNG (chunk {typ!r} overruns payload)")
        data = b[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", b[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    w, h, depth, ctype, comp, filt, inter = ihdr
    if depth not in (8, 16) or inter not in (0, 1) or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG shape (depth={depth}, interlace={inter}) — "
            "built-in decoder handles 8/16-bit, plain or Adam7; install "
            "pillow for sub-byte depths"
        )
    try:
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    except KeyError:
        raise ValueError(f"bad PNG color type {ctype}") from None
    if ctype == 3 and depth == 16:
        raise ValueError("16-bit palette PNG is not a legal shape")
    sb = depth // 8  # bytes per sample
    bpp = ch * sb
    raw = zlib.decompress(bytes(idat))

    def rows_to_px(block, ph, pw):
        """Unfiltered bytes uint8[ph, pw*bpp] -> samples [ph, pw, ch]."""
        if sb == 1:
            return block.reshape(ph, pw, ch)
        return (
            block.reshape(ph, pw * ch, 2)
            .astype(np.uint16)[:, :, 0] * 256
            + block.reshape(ph, pw * ch, 2).astype(np.uint16)[:, :, 1]
        ).reshape(ph, pw, ch)

    if inter == 0:
        stride = w * bpp
        if len(raw) != (stride + 1) * h:
            raise ValueError("PNG IDAT length does not match dimensions")
        arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
        px = rows_to_px(_png_unfilter(arr, h, stride, bpp), h, w)
    else:
        # Adam7: seven independently-filtered sub-images, scattered onto
        # the full grid by each pass's (x0, y0, dx, dy)
        px = np.zeros((h, w, ch), np.uint16 if sb == 2 else np.uint8)
        off = 0
        for x0, y0, dx, dy in ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            need = (stride + 1) * ph
            if off + need > len(raw):
                raise ValueError("PNG IDAT too short for Adam7 passes")
            arr = np.frombuffer(raw[off : off + need], np.uint8).reshape(
                ph, stride + 1
            )
            off += need
            sub = rows_to_px(_png_unfilter(arr, ph, stride, bpp), ph, pw)
            px[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("PNG IDAT length does not match Adam7 passes")
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        px = plte[px[:, :, 0]]
        ch = 3
    return w, h, ch, px


def encode_png(px, interlace: bool = False) -> bytes:
    """[h, w, ch] uint8 (depth 8) or uint16 (depth 16, big-endian samples)
    -> PNG bytes (filter-0 scanlines, zlib level 9, optional Adam7) — the
    parse_png inverse, also the fixture generator for the un-skipped
    real-decode tests."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    depth = 16 if px.dtype == np.uint16 else 8

    def row_bytes(rows):
        return rows.astype(">u2").tobytes() if depth == 16 else rows.tobytes()

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    if interlace:
        parts = []
        for x0, y0, dx, dy in ADAM7_PASSES:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + row_bytes(sub[y]) for y in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + row_bytes(px[y]) for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0))
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def decode_image(b: bytes):
    """Real decode -> (width, height, mean_sample_value). Netpbm, PNG
    (8/16-bit, plain or Adam7), GIF and baseline JPEG payloads use the
    built-in parsers (identical output with or without PIL); shapes the
    built-ins can't handle (sub-byte-depth PNG, arithmetic-coded JPEG)
    fall back to PIL; anything else needs PIL."""
    import numpy as np

    if b[:2] in (b"P5", b"P6"):
        w, h, _, px, _ = parse_netpbm(b)
        return w, h, float(px.mean())
    pil_fallback_err = None
    if b[:2] == b"\xff\xd8":
        try:
            px = jpegcodec.decode_jpeg(b)
            return px.shape[1], px.shape[0], float(px.mean())
        except NotImplementedError as e:
            pil_fallback_err = e  # arithmetic / 12-bit: try PIL below
    if b[:8] == PNG_SIG:
        try:
            w, h, _, px = parse_png(b)
            return w, h, float(px.mean())
        except ValueError as e:
            pil_fallback_err = e  # sub-byte depth / corrupt: try PIL below
    if b[:6] in GIF_MAGICS:
        # lossless + fully covered by the built-in decoder — no PIL fallback;
        # mean is over the first COMPOSITED RGB frame (PIL's palette-index
        # mean on mode-"P" GIFs was never meaningful for features)
        w, h, frames = gifcodec.parse_gif(b)
        return w, h, float(frames[0].mean())
    image_mod = pil_image_module()
    if image_mod is None:
        if pil_fallback_err is not None:
            raise NotImplementedError(
                f"payload beyond the built-in decoders ({pil_fallback_err}) "
                "and PIL is not installed"
            ) from pil_fallback_err
        raise NotImplementedError(
            "payload is not binary netpbm, PNG, baseline JPEG or GIF and PIL "
            "is not installed — pip install pillow for other image formats"
        )
    import io

    with image_mod.open(io.BytesIO(b)) as im:
        arr = np.asarray(im)
        return im.width, im.height, float(arr.mean())


def resize_image(b: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample; netpbm in -> netpbm out, PNG in -> PNG out
    (built-in codec both ways), other PIL formats round-trip through PIL
    (re-encoded in the source format)."""
    import numpy as np

    if b[:2] in (b"P5", b"P6"):
        _, _, _, px, _ = parse_netpbm(b)
        ys = (np.arange(height) * px.shape[0]) // height
        xs = (np.arange(width) * px.shape[1]) // width
        return encode_netpbm(px[ys][:, xs])
    if b[:2] == b"\xff\xd8":
        try:
            px = jpegcodec.decode_jpeg(b)
        except NotImplementedError:
            px = None  # arithmetic / 12-bit: PIL below when present
        if px is not None:
            ys = (np.arange(height) * px.shape[0]) // height
            xs = (np.arange(width) * px.shape[1]) // width
            return jpegcodec.encode_jpeg(np.ascontiguousarray(px[ys][:, xs]))
    if b[:8] == PNG_SIG:
        try:
            _, _, _, px = parse_png(b)
            ys = (np.arange(height) * px.shape[0]) // height
            xs = (np.arange(width) * px.shape[1]) // width
            return encode_png(np.ascontiguousarray(px[ys][:, xs]))
        except ValueError:
            pass  # sub-byte depth / corrupt: PIL below when present
    if b[:6] in GIF_MAGICS:
        import numpy as np

        w0, h0, frames = gifcodec.parse_gif(b)
        px = frames[0]
        ys = (np.arange(height) * px.shape[0]) // height
        xs = (np.arange(width) * px.shape[1]) // width
        rs = np.ascontiguousarray(px[ys][:, xs])
        # rebuild an indexed palette from the surviving colors (bounded by
        # the source color tables, so always <= 256)
        colors, inv = np.unique(rs.reshape(-1, 3), axis=0, return_inverse=True)
        idx = inv.reshape(height, width).astype(np.uint8)
        return gifcodec.encode_gif([idx], colors.astype(np.uint8))
    image_mod = pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "payload is not binary netpbm, 8-bit PNG or GIF and PIL is not "
            "installed — pip install pillow for other compressed formats"
        )
    import io

    with image_mod.open(io.BytesIO(b)) as im:
        fmt = im.format or "PNG"
        out = io.BytesIO()
        im.resize((width, height), image_mod.NEAREST).save(out, format=fmt)
        return out.getvalue()


def demux_frames(b: bytes) -> list[bytes]:
    """Demux a concatenated-netpbm stream (ffmpeg image2pipe layout: P5/P6
    images back to back) natively; other containers need PIL's multi-frame
    support (GIF/TIFF); general video (mp4/mkv) still needs ffmpeg."""
    if b[:2] in (b"P5", b"P6"):
        frames, off = [], 0
        while off < len(b):
            start = off
            _, _, _, _, off = parse_netpbm(b, off)
            frames.append(b[start:off])
        return frames
    if b[:8] == PNG_SIG:
        try:
            parse_png(b)  # validate; a PNG is one frame (APNG needs PIL)
            return [b]
        except ValueError:
            pass
    if b[:6] in GIF_MAGICS:
        # composited RGB frames re-encoded as PNG, matching the PIL branch's
        # per-frame PNG convention
        _, _, frames = gifcodec.parse_gif(b)
        return [encode_png(f) for f in frames]
    image_mod = pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "payload is not a concatenated-netpbm stream and PIL is not "
            "installed — pip install pillow for TIFF; video containers "
            "need ffmpeg"
        )
    import io

    with image_mod.open(io.BytesIO(b)) as im:
        frames = []
        for i in range(getattr(im, "n_frames", 1)):
            im.seek(i)
            out = io.BytesIO()
            im.save(out, format="PNG")
            frames.append(out.getvalue())
        return frames
