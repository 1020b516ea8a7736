"""Pure-Python image codec helpers for the multimodal operators.

Spark-free by design: the mapInPandas bodies in operators/multimodal.py bind
these functions into their closures and register THIS module for
pickle-by-value (functions/shippable.py), so executors that have never heard
of the package can still run the real-decode branch.

Netpbm payloads (binary PGM ``P5`` / PPM ``P6`` — the layout ffmpeg's
image2pipe emits) decode identically whether or not PIL is installed; PIL
only extends coverage to compressed formats (PNG/JPEG/GIF/...).
"""

from __future__ import annotations


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


def decode_image(b: bytes):
    """Real decode -> (width, height, mean_sample_value). Netpbm payloads use
    the built-in parser; anything else needs PIL."""
    import numpy as np

    if b[:2] in (b"P5", b"P6"):
        w, h, _, px, _ = parse_netpbm(b)
        return w, h, float(px.mean())
    image_mod = pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "payload is not binary netpbm and PIL is not installed — "
            "pip install pillow for compressed image formats"
        )
    import io

    with image_mod.open(io.BytesIO(b)) as im:
        arr = np.asarray(im)
        return im.width, im.height, float(arr.mean())


def resize_image(b: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample; netpbm in -> netpbm out, PIL formats
    round-trip through PIL (re-encoded in the source format)."""
    import numpy as np

    if b[:2] in (b"P5", b"P6"):
        _, _, _, px, _ = parse_netpbm(b)
        ys = (np.arange(height) * px.shape[0]) // height
        xs = (np.arange(width) * px.shape[1]) // width
        return encode_netpbm(px[ys][:, xs])
    image_mod = pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "payload is not binary netpbm and PIL is not installed — "
            "pip install pillow for compressed image formats"
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
    image_mod = pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "payload is not a concatenated-netpbm stream and PIL is not "
            "installed — pip install pillow for GIF/TIFF; video containers "
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
