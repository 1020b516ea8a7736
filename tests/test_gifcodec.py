"""Built-in GIF codec (operators/gifcodec.py) + its mmcodec dispatch and the
gif_image_features closed form. Engine exactness of the oracle row is covered
by test_catalog_oracle.py; these pin the codec itself: LZW round trips (KwKwK,
dictionary reset, all code sizes), interlace, palettes (local + non-pow2),
transparency, multi-frame disposal compositing, and malformed-input failure.
"""

from __future__ import annotations

import numpy as np
import pytest

from hdfs2cass_spark.operators.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    encode_gif,
    interlace_order,
    parse_gif,
)


def _palette(n):
    k = np.arange(n, dtype=np.int64)
    return np.stack(
        [(5 * k + 11) % 256, (7 * k + 3) % 256, (11 * k + 29) % 256], axis=1
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mcs", [2, 3, 4, 5, 8])
def test_lzw_roundtrip_random_and_runs(mcs):
    rng = np.random.RandomState(mcs)
    n = 1 << mcs
    data = (
        bytes(rng.randint(0, n, size=5000).astype(np.uint8))
        + bytes([n - 1]) * 3000
        + bytes(rng.randint(0, n, size=500).astype(np.uint8))
    )
    assert _lzw_decode(_lzw_encode(data, mcs), mcs, len(data)) == data


def test_lzw_kwkwk_case():
    """'abababab...' forces the decoder to reference the code it is about to
    define (code == len(table)) — the classic KwKwK special case."""
    data = bytes([0, 1] * 400) + bytes([0, 0, 0])
    assert _lzw_decode(_lzw_encode(data, 2), 2, len(data)) == data


def test_lzw_dictionary_reset_at_4096():
    """Enough 8-bit noise grows the dictionary past 4096 entries, forcing a
    mid-stream CLEAR + reset on encode; decode must follow."""
    rng = np.random.RandomState(7)
    data = bytes(rng.randint(0, 256, size=40000).astype(np.uint8))
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_lzw_truncated_stream_raises():
    data = bytes(range(16)) * 10
    enc = _lzw_encode(data, 4)
    with pytest.raises(ValueError):
        _lzw_decode(enc[: len(enc) // 2], 4, len(data))


def test_lzw_bad_code_raises():
    # a code far beyond the table must fail loudly, not index garbage
    with pytest.raises(ValueError):
        _lzw_decode(b"\xff\xff\xff\xff", 2, 100)


# ---------------------------------------------------------------------------
# Container round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_colors", [2, 3, 4, 7, 16, 100, 256])
def test_single_frame_roundtrip_palette_sizes(n_colors):
    """Non-power-of-two logical palettes ride padded physical tables."""
    pal = _palette(n_colors)
    rng = np.random.RandomState(n_colors)
    idx = rng.randint(0, n_colors, size=(13, 17)).astype(np.uint8)
    w, h, frames = parse_gif(encode_gif([idx], pal))
    assert (w, h, len(frames)) == (17, 13, 1)
    assert np.array_equal(frames[0], pal[idx])


def test_interlace_order_spec_values():
    # spec: pass 1 rows 0,8,..; pass 2 rows 4,12,..; pass 3 2,6,..; pass 4 odd
    assert interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert interlace_order(1) == [0]
    assert sorted(interlace_order(37)) == list(range(37))


@pytest.mark.parametrize("h", [1, 2, 5, 8, 23])
def test_interlaced_roundtrip_equals_plain(h):
    pal = _palette(9)
    idx = (np.add.outer(np.arange(h), np.arange(11)) % 9).astype(np.uint8)
    _, _, plain = parse_gif(encode_gif([idx], pal, interlace=False))
    _, _, inter = parse_gif(encode_gif([idx], pal, interlace=True))
    assert np.array_equal(plain[0], inter[0])


def test_interlace_actually_reorders_raster():
    """The interlaced payload must differ from the plain one (same pixels,
    different raster order) — guards against the flag being a no-op."""
    pal = _palette(4)
    idx = (np.arange(16)[:, None] % 4 * np.ones((1, 8), np.int64)).astype(np.uint8)
    assert encode_gif([idx], pal, interlace=True) != encode_gif([idx], pal)


def test_gif87a_header_accepted():
    pal = _palette(4)
    idx = np.zeros((4, 4), np.uint8)
    b = bytearray(encode_gif([idx], pal))
    b[:6] = b"GIF87a"
    w, h, frames = parse_gif(bytes(b))
    assert (w, h) == (4, 4)
    assert np.array_equal(frames[0], pal[idx])


def test_transparency_shows_background():
    pal = _palette(5)
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    b = encode_gif([idx], pal, frame_meta=[{"transparent": 2}], background=4)
    _, _, frames = parse_gif(b)
    want = pal[idx].copy()
    want[1, 0] = pal[4]  # the transparent pixel exposes the background color
    assert np.array_equal(frames[0], want)


def test_multiframe_disposal_and_local_palette():
    """Three frames: full base, an offset overlay with a transparent hole +
    local palette + disposal 2 (restore background), then a small frame whose
    disposal 3 (restore previous) never affects earlier composites."""
    gpal = _palette(6)
    lpal = np.array([[9, 9, 9], [200, 100, 50], [1, 2, 3], [0, 0, 0]], np.uint8)
    base = np.zeros((10, 12), np.uint8)
    over = np.full((4, 5), 1, np.uint8)
    over[1, 1] = 3
    tiny = np.full((2, 2), 2, np.uint8)
    b = encode_gif(
        [base, (over, 3, 2), (tiny, 0, 0)],
        gpal,
        screen_size=(12, 10),
        frame_meta=[
            {},
            {"transparent": 3, "disposal": 2, "palette": lpal},
            {"disposal": 3},
        ],
        background=5,
    )
    w, h, frames = parse_gif(b)
    assert (w, h, len(frames)) == (12, 10, 3)
    c0 = np.broadcast_to(gpal[0], (10, 12, 3)).copy()
    assert np.array_equal(frames[0], c0)
    c1 = c0.copy()
    region = c1[2:6, 3:8]
    rgb = lpal[over]
    mask = over != 3
    region[mask] = rgb[mask]
    assert np.array_equal(frames[1], c1)
    c2 = c0.copy()
    c2[2:6, 3:8] = gpal[5]  # disposal 2 restored the overlay rect to bg
    c2[0:2, 0:2] = gpal[2]  # tiny frame has no LCT, so it uses the GCT
    assert np.array_equal(frames[2], c2)
    # Netscape loop extension present on multi-frame payloads
    assert b"NETSCAPE2.0" in b


@pytest.mark.parametrize(
    "bad",
    [b"", b"GIF89a", b"NOPE\x00\x00\x00\x00\x00\x00\x00\x00\x00", b"GIF89a" + b"\x00" * 7],
)
def test_malformed_inputs_raise_value_error(bad):
    with pytest.raises(ValueError):
        parse_gif(bad)


@pytest.mark.parametrize("cut", [8, 13, 20, 30, 45])
def test_truncated_prefixes_raise_value_error_only(cut):
    full = encode_gif([np.zeros((9, 9), np.uint8)], _palette(4))
    with pytest.raises(ValueError):
        parse_gif(full[: min(cut, len(full) - 1)])


def test_frame_outside_screen_rejected():
    pal = _palette(4)
    b = encode_gif([(np.zeros((4, 4), np.uint8), 3, 3)], pal, screen_size=(7, 7))
    # 4x4 at (3,3) fits a 7x7 screen exactly; shrink the declared screen
    patched = bytearray(b)
    patched[6:8] = (6).to_bytes(2, "little")  # width 7 -> 6
    with pytest.raises(ValueError):
        parse_gif(bytes(patched))


def test_encoder_rejects_out_of_palette_index():
    with pytest.raises(ValueError):
        encode_gif([np.full((3, 3), 7, np.uint8)], _palette(4))


# ---------------------------------------------------------------------------
# mmcodec dispatch
# ---------------------------------------------------------------------------


def test_decode_image_gif_branch():
    from hdfs2cass_spark.operators.mmcodec import decode_image

    pal = _palette(5)
    idx = (np.add.outer(np.arange(6), np.arange(9)) % 5).astype(np.uint8)
    w, h, mean = decode_image(encode_gif([idx], pal))
    assert (w, h) == (9, 6)
    assert mean == pytest.approx(float(pal[idx].mean()))


def test_demux_frames_gif_to_png():
    from hdfs2cass_spark.operators.mmcodec import demux_frames, parse_png

    pal = _palette(4)
    frames_in = [np.full((5, 7), i, np.uint8) for i in range(3)]
    pngs = demux_frames(encode_gif(frames_in, pal, screen_size=(7, 5)))
    assert len(pngs) == 3
    for i, png in enumerate(pngs):
        w, h, ch, px = parse_png(png)
        assert (w, h, ch) == (7, 5, 3)
        assert np.array_equal(px, np.broadcast_to(pal[i], (5, 7, 3)))


def test_resize_image_gif_stays_gif():
    from hdfs2cass_spark.operators.mmcodec import resize_image

    pal = _palette(4)
    idx = (np.add.outer(np.arange(8), np.arange(8)) % 4).astype(np.uint8)
    out = resize_image(encode_gif([idx], pal), 4, 4)
    assert out[:6] in (b"GIF87a", b"GIF89a")
    w, h, frames = parse_gif(out)
    assert (w, h) == (4, 4)
    src = pal[idx]
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(frames[0], src[ys][:, xs])
