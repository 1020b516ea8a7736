"""Multimodal plumbing tests: binary payload + mapInPandas feature extraction."""

import pytest
from pyspark.sql import functions as F

from hdfs2cass_spark.operators.multimodal import attach_media, extract_features


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return attach_media(
        docs.select("doc_id", F.col("text").cast("binary").alias("blob")),
        id_col="doc_id",
        payload_col="blob",
        media_type="image/fake",
    )


def test_media_schema(media):
    assert media.columns == ["media_id", "payload", "media_type", "byte_len"]
    row = media.first()
    assert row["byte_len"] == len(row["payload"])


def test_extract_features_deterministic(media):
    f1 = {r["media_id"]: tuple(r) for r in extract_features(media).collect()}
    f2 = {r["media_id"]: tuple(r) for r in extract_features(media).collect()}
    assert f1 == f2
    some = next(iter(f1.values()))
    assert some[3] >= 1 and some[4] >= 1  # width/height
    assert 0.0 <= some[6] <= 255.0  # mean byte intensity


def test_extract_features_real_decode_raises(media):
    """Text payloads are neither netpbm nor PIL-decodable: the real branch
    must fail loudly, never emit garbage features."""
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        extract_features(media, decode_stub=False).collect()


def _ppm(width, height, pixel_fn):
    """Binary P6 bytes with pixel_fn(y, x) -> (r, g, b)."""
    raster = bytes(
        c for y in range(height) for x in range(width) for c in pixel_fn(y, x)
    )
    return b"P6\n# test comment\n" + f"{width} {height}\n255\n".encode() + raster


@pytest.fixture(scope="module")
def netpbm_media(spark):
    import pandas as pd

    payloads = [
        _ppm(4, 2, lambda y, x: (10 * x, 10 * y, 100)),
        b"P5\n2 2\n255\n" + bytes([0, 50, 100, 250]),
    ]
    pdf = pd.DataFrame({"media_id": [0, 1], "blob": payloads})
    return attach_media(
        spark.createDataFrame(pdf), id_col="media_id", payload_col="blob",
        media_type="image/x-portable-anymap",
    )


def test_real_decode_netpbm_features(netpbm_media):
    """decode_stub=False REALLY decodes netpbm: header dimensions and exact
    mean sample value, no codec dependency."""
    rows = {r["media_id"]: r for r in extract_features(netpbm_media, decode_stub=False).collect()}
    p6 = rows[0]
    assert (p6["width"], p6["height"], p6["n_frames"]) == (4, 2, 1)
    expected = sum(
        v for y in range(2) for x in range(4) for v in (10 * x, 10 * y, 100)
    ) / 24
    assert abs(p6["mean_intensity"] - expected) < 1e-9
    p5 = rows[1]
    assert (p5["width"], p5["height"]) == (2, 2)
    assert abs(p5["mean_intensity"] - 100.0) < 1e-9


def test_real_resize_netpbm_nearest_neighbor(netpbm_media):
    from hdfs2cass_spark.operators.mmcodec import parse_netpbm
    from hdfs2cass_spark.operators.multimodal import resize_media

    rows = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_media(netpbm_media, width=2, height=1, decode_stub=False).collect()
    }
    w, h, ch, px, _ = parse_netpbm(rows[0])
    assert (w, h, ch) == (2, 1, 3)
    # nearest-neighbor from the 4x2 source: rows map to y=0, cols to x=0,2
    assert px[0, 0].tolist() == [0, 0, 100]
    assert px[0, 1].tolist() == [20, 0, 100]
    w, h, ch, px, _ = parse_netpbm(rows[1])
    assert (w, h, ch) == (2, 1, 1)
    assert px[0, 0].tolist() == [0] and px[0, 1].tolist() == [50]


def test_real_frames_concatenated_netpbm_stream(spark):
    """A concatenated-P6 stream (ffmpeg image2pipe layout) demuxes natively:
    every_n selection over REAL frame boundaries, each frame re-parseable."""
    import pandas as pd

    from hdfs2cass_spark.operators.mmcodec import parse_netpbm
    from hdfs2cass_spark.operators.multimodal import sample_frames

    frames_src = [_ppm(2, 1, lambda y, x, i=i: (i, i, i)) for i in range(5)]
    stream = b"".join(frames_src)
    pdf = pd.DataFrame({"media_id": [7], "blob": [stream]})
    media = attach_media(
        spark.createDataFrame(pdf), id_col="media_id", payload_col="blob",
        media_type="video/x-ppm-stream",
    )
    rows = sorted(
        sample_frames(media, every_n=2, decode_stub=False).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r in rows:
        assert bytes(r["frame"]) == frames_src[r["frame_idx"]]
        w, h, ch, px, _ = parse_netpbm(bytes(r["frame"]))
        assert (w, h, ch) == (2, 1, 3)
        assert px[0, 0].tolist() == [r["frame_idx"]] * 3


def test_real_decode_via_pil_when_available(spark):
    """PIL branch (skips where pillow isn't installed): a PNG payload decodes
    through PIL with the same feature semantics as the netpbm branch."""
    image_mod = pytest.importorskip("PIL.Image")
    import io

    import numpy as np
    import pandas as pd

    arr = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    buf = io.BytesIO()
    image_mod.fromarray(arr, "RGB").save(buf, format="PNG")
    pdf = pd.DataFrame({"media_id": [0], "blob": [buf.getvalue()]})
    media = attach_media(
        spark.createDataFrame(pdf), id_col="media_id", payload_col="blob",
        media_type="image/png",
    )
    row = extract_features(media, decode_stub=False).collect()[0]
    assert (row["width"], row["height"]) == (2, 2)
    assert abs(row["mean_intensity"] - arr.mean()) < 1e-9


def test_resize_media_shape_and_determinism(media):
    from hdfs2cass_spark.operators.multimodal import resize_media

    out = resize_media(media, width=8, height=4)
    rows = out.collect()
    assert out.columns == ["media_id", "media_type", "payload", "byte_len", "width", "height"]
    assert len(rows) == media.count()
    for r in rows:
        assert r["byte_len"] == 32 and len(r["payload"]) == 32
        assert (r["width"], r["height"]) == (8, 4)
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_media(media, 8, 4).collect()}
    assert again == {r["media_id"]: bytes(r["payload"]) for r in rows}


def test_sample_frames_amplifies_inside_batches(media):
    from hdfs2cass_spark.operators.multimodal import sample_frames

    frames = sample_frames(media, every_n=2, frame_bytes=64)
    rows = frames.collect()
    assert frames.columns == ["media_id", "frame_idx", "frame", "frame_len"]
    assert len(rows) > media.count()  # 1 -> N amplification
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, fr in by_media.items():
        idxs = sorted(r["frame_idx"] for r in fr)
        assert idxs == list(range(0, 2 * len(idxs), 2))  # every 2nd frame
        for r in fr:
            i = r["frame_idx"]
            assert bytes(r["frame"]) == src[mid][i * 64 : (i + 1) * 64]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_frames(media, every_n=0)

def _forward_filter(px, filters):
    """Independent FORWARD PNG filtering (the encoder direction, written
    from the spec in this test, not shared with the decoder) — so the
    decoder's unfiltering is checked against a second implementation."""
    import numpy as np

    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    out = []
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        row = bytearray([f])
        for i in range(stride):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            x = int(cur[i])
            if f == 0:
                v = x
            elif f == 1:
                v = x - a
            elif f == 2:
                v = x - b
            elif f == 3:
                v = x - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = x - pred
            row.append(v & 0xFF)
        out.append(bytes(row))
    return b"".join(out)


def _png_from_raw(w, h, ctype, raw, plte=None, depth=8):
    import struct
    import zlib

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    )
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_16bit_roundtrip_and_filters():
    """Depth-16 PNG (r13): encode/parse round trip per color type, plus the
    independent forward-filter check running over the BYTE view with
    bpp = 2*ch (the spec's 'left' reaches bpp bytes back)."""
    import numpy as np

    from hdfs2cass_spark.operators.mmcodec import encode_png, parse_png

    rng = np.random.RandomState(16)
    for ch, ctype in ((1, 0), (3, 2), (2, 4), (4, 6)):
        px = rng.randint(0, 1 << 16, size=(5, 4, ch)).astype(np.uint16)
        px[0, 0] = 0
        px[0, 1] = 0xFFFF  # force the extremes through the byte split
        w, h, got_ch, got = parse_png(encode_png(px))
        assert (w, h, got_ch) == (4, 5, ch)
        assert got.dtype == np.uint16 and np.array_equal(got, px)
        # independent forward filtering over bytes, all five filters
        bview = np.ascontiguousarray(px.astype(">u2")).view(np.uint8).reshape(5, 4, 2 * ch)
        raw = _forward_filter(bview, filters=[0, 1, 2, 3, 4])
        w, h, got_ch, got = parse_png(_png_from_raw(4, 5, ctype, raw, depth=16))
        assert got.dtype == np.uint16 and np.array_equal(got, px)


def test_png_adam7_roundtrip():
    """Adam7 interlace (r13): round trip at sizes exercising empty and
    partial passes, both depths; the interlaced payload must genuinely
    differ from the plain one (raster reordered, not a no-op flag)."""
    import numpy as np

    from hdfs2cass_spark.operators.mmcodec import encode_png, parse_png

    rng = np.random.RandomState(77)
    for wh in ((1, 1), (3, 2), (7, 7), (8, 8), (13, 9), (16, 5)):
        w0, h0 = wh
        for dt, hi in ((np.uint8, 256), (np.uint16, 1 << 16)):
            px = rng.randint(0, hi, size=(h0, w0, 3)).astype(dt)
            enc = encode_png(px, interlace=True)
            w, h, ch, got = parse_png(enc)
            assert (w, h, ch) == (w0, h0, 3)
            assert np.array_equal(got, px), (wh, dt)
    px = rng.randint(0, 256, size=(8, 8, 1), dtype=np.uint8)
    assert encode_png(px, interlace=True) != encode_png(px)


def test_png_16bit_palette_rejected():
    import numpy as np
    import pytest as pt

    from hdfs2cass_spark.operators.mmcodec import parse_png

    raw = b"\x00" + b"\x00" * 2  # one row, junk
    with pt.raises(ValueError, match="16-bit palette"):
        parse_png(_png_from_raw(1, 1, 3, raw, plte=b"\x00" * 6, depth=16))


def test_png_builtin_all_filters_and_color_types():
    """parse_png reconstructs exactly what an independent forward-filter
    produced, for every scanline filter and every 8-bit color type — the
    spec-equivalence pin for the dependency-free decoder."""
    import numpy as np

    from hdfs2cass_spark.operators.mmcodec import encode_png, parse_png

    rng = np.random.RandomState(7)
    for ch, ctype in ((1, 0), (3, 2), (2, 4), (4, 6)):
        px = rng.randint(0, 256, size=(5, 4, ch), dtype=np.uint8)
        raw = _forward_filter(px, filters=[0, 1, 2, 3, 4])
        w, h, got_ch, got = parse_png(_png_from_raw(4, 5, ctype, raw))
        assert (w, h, got_ch) == (4, 5, ch)
        assert np.array_equal(got, px), f"ctype {ctype}"
        # and the round trip through our own encoder
        w2, h2, ch2, back = parse_png(encode_png(px))
        assert np.array_equal(back, px)

    # palette color type expands through PLTE to RGB
    idx = rng.randint(0, 4, size=(3, 3, 1), dtype=np.uint8)
    plte = bytes(rng.randint(0, 256, size=12, dtype=np.uint8))
    raw = _forward_filter(idx, filters=[0, 1, 4])
    w, h, ch, got = parse_png(_png_from_raw(3, 3, 3, raw, plte=plte))
    assert (w, h, ch) == (3, 3, 3)
    exp = np.frombuffer(plte, np.uint8).reshape(-1, 3)[idx[:, :, 0]]
    assert np.array_equal(got, exp)


def test_png_builtin_rejects_corruption():
    import struct

    import numpy as np
    import pytest as pt

    from hdfs2cass_spark.operators.mmcodec import encode_png, parse_png

    px = np.zeros((2, 2, 3), np.uint8)
    good = encode_png(px)
    bad = bytearray(good)
    bad[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pt.raises(ValueError, match="CRC"):
        parse_png(bytes(bad))
    with pt.raises(ValueError, match="signature"):
        parse_png(b"JUNK" + good)
    # sub-byte depth is out of the built-in envelope and says so (16-bit
    # and Adam7 joined the envelope in r13)
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    hdr = good[:8] + struct.pack(">I", 13) + b"IHDR" + ihdr4
    import zlib

    hdr += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr4) & 0xFFFFFFFF)
    with pt.raises(ValueError, match="unsupported PNG"):
        parse_png(hdr + good[33:])


def test_real_decode_png_builtin(spark):
    """The real-decode branch over a REAL compressed format, un-skipped in
    dependency-free environments: PNG payloads flow through attach_media ->
    extract_features(decode_stub=False) with exact width/height/mean, and
    resize_media round-trips PNG -> PNG."""
    import numpy as np
    import pandas as pd

    from hdfs2cass_spark.operators.mmcodec import encode_png, parse_png
    from hdfs2cass_spark.operators.multimodal import resize_media

    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    pdf = pd.DataFrame({"media_id": [0], "blob": [encode_png(arr)]})
    media = attach_media(
        spark.createDataFrame(pdf), id_col="media_id", payload_col="blob",
        media_type="image/png",
    )
    row = extract_features(media, decode_stub=False).collect()[0]
    assert (row["width"], row["height"]) == (4, 4)
    assert abs(row["mean_intensity"] - arr.mean()) < 1e-9

    rz = resize_media(media, width=2, height=2, decode_stub=False).collect()[0]
    w, h, ch, px = parse_png(bytes(rz["payload"]))
    assert (w, h, ch) == (2, 2, 3)
    assert np.array_equal(px, arr[[0, 2]][:, [0, 2]])  # nearest-neighbor grid


def test_parse_png_truncated_chunk_raises_valueerror():
    """A length-inflated chunk header must raise the designed ValueError
    (decode_image catches it for the PIL fallback), not struct.error
    (review round 11)."""
    import struct

    import pytest

    from hdfs2cass_spark.operators.mmcodec import PNG_SIG, parse_png

    evil = PNG_SIG + struct.pack(">I", 10_000) + b"IHDR" + b"\x00" * 4
    with pytest.raises(ValueError, match="truncated PNG"):
        parse_png(evil)
