"""Built-in baseline JPEG codec (operators/jpegcodec.py) + its mmcodec
dispatch and the jpeg_image_features closed-form prediction. Engine
exactness of the oracle row is covered by test_catalog_oracle.py; these pin
the codec: round-trip quality per mode, flat-block exactness, restart
resync, subsampling, non-baseline rejection, malformed-input failure.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hdfs2cass_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    scaled_quant,
    QUANT_LUMA,
)


def _psnr(a, b) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _gradient_gray(h=48, w=64):
    x = np.arange(w)
    y = np.arange(h)
    return np.clip(np.add.outer(y * 3, x * 2) // 2, 0, 255).astype(np.uint8)


def _gradient_rgb(h=40, w=56):
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[..., 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
    img[..., 2] = 90
    return img


@pytest.mark.parametrize("g", [0, 1, 73, 128, 254, 255])
def test_flat_gray_roundtrip_is_constant(g):
    """A flat image is DC-only: decode must return a single level, equal to
    the closed-form quantization prediction."""
    from hdfs2cass_spark.plans.image import predicted_gray

    img = np.full((19, 27), g, np.uint8)  # not block-aligned: padding in play
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert out.shape == img.shape
    u = np.unique(out)
    assert len(u) == 1
    assert int(u[0]) == predicted_gray(g)


def test_gray_gradient_high_fidelity():
    img = _gradient_gray()
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > 40


def test_color_444_and_420_roundtrip():
    img = _gradient_rgb()
    out444 = decode_jpeg(encode_jpeg(img, quality=90))
    assert out444.shape == img.shape
    assert _psnr(img, out444) > 35
    out420 = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out420.shape == img.shape
    assert _psnr(img, out420) > 28
    # 4:2:0 is genuinely smaller on chroma-heavy content
    assert len(encode_jpeg(img, subsample=True)) < len(encode_jpeg(img))


def test_restart_markers_resync():
    """DRI + RSTn: the decoder must resync predictors at every interval and
    produce the same image as the marker-free encoding."""
    img = _gradient_rgb(24, 40)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=1))
    assert np.array_equal(plain, rst)
    assert b"\xff\xd0" in encode_jpeg(img, quality=85, restart_interval=1)


def test_quality_scales_size_and_error():
    img = _gradient_gray()
    lo, hi = encode_jpeg(img, quality=20), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(img, decode_jpeg(hi)) > _psnr(img, decode_jpeg(lo))


def test_scaled_quant_bounds():
    assert scaled_quant(QUANT_LUMA, 50) == QUANT_LUMA
    assert all(q == 1 for q in scaled_quant(QUANT_LUMA, 100))
    assert all(1 <= q <= 255 for q in scaled_quant(QUANT_LUMA, 1))
    with pytest.raises(ValueError):
        scaled_quant(QUANT_LUMA, 0)


def test_arithmetic_sof_rejected_loudly():
    b = bytearray(encode_jpeg(_gradient_gray(16, 16)))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC9  # masquerade as arithmetic-coded sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(b))


@pytest.mark.parametrize("successive", [False, True])
@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_decodes_identical_to_baseline(successive, subsample):
    """The decisive progressive check: SOF2 scans carry the IDENTICAL
    quantized coefficients as the baseline encoding, so the two decodes must
    agree bit-for-bit — two independent entropy codings (huffman sequential
    vs spectral-selection/successive-approximation with EOB runs)
    cross-validating each other with no external codec."""
    from hdfs2cass_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.RandomState(11)
    imgs = [
        _gradient_rgb(33, 41),
        rng.randint(0, 256, (17, 23, 3)).astype(np.uint8),
    ]
    for img in imgs:
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quality=85, subsample=subsample, successive=successive
            )
        )
        assert np.array_equal(base, prog)


@pytest.mark.parametrize("successive", [False, True])
def test_progressive_gray_and_tiny(successive):
    from hdfs2cass_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.RandomState(5)
    for img in (_gradient_gray(19, 27), rng.randint(0, 256, (3, 5)).astype(np.uint8),
                rng.randint(0, 256, (1, 1)).astype(np.uint8)):
        base = decode_jpeg(encode_jpeg(img, quality=90))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=90, successive=successive))
        assert np.array_equal(base, prog)


def test_progressive_truncated_scan_raises():
    from hdfs2cass_spark.operators.jpegcodec import encode_jpeg_progressive

    b = encode_jpeg_progressive(_gradient_gray(32, 32), successive=True)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(b[: int(len(b) * 0.6)])


def test_progressive_is_actually_multiscan():
    from hdfs2cass_spark.operators.jpegcodec import encode_jpeg_progressive

    plain = encode_jpeg_progressive(_gradient_rgb(16, 16))
    sa = encode_jpeg_progressive(_gradient_rgb(16, 16), successive=True)
    # 1 DC + 2 AC bands x 3 comps = 7 scans; SA doubles them
    assert plain.count(b"\xff\xda") == 7
    assert sa.count(b"\xff\xda") == 14
    assert plain[2:].find(b"\xff\xc2") >= 0  # SOF2, not SOF0


@pytest.mark.parametrize(
    "bad",
    [b"", b"\x00\x01", b"\xff\xd8\xff\xd9", b"\xff\xd8" + b"\xff\xda" + struct.pack(">H", 3) + b"\x00"],
)
def test_malformed_inputs_raise_value_error(bad):
    # contract (ADVICE r12): malformed input is ValueError/NotImplementedError
    # ONLY — mmcodec callers catch exactly these, so struct.error/IndexError
    # must not leak out of header parsing
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bad)


@pytest.mark.parametrize("cut", [3, 5, 9, 14, 21, 40, 120])
def test_truncated_prefixes_raise_value_error_only(cut):
    """Every truncation point of a real stream must surface as ValueError
    (or NotImplementedError), never struct.error / IndexError."""
    full = encode_jpeg(_gradient_gray(16, 16), quality=85)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(full[: min(cut, len(full) - 1)])


def test_single_component_scan_is_noninterleaved():
    """T.81 A.2.2: a grayscale JPEG whose SOF declares 2x2 sampling still
    carries a NON-interleaved scan (one data unit per MCU, block raster over
    ceil(w/8) wide rows). Patching the sampling byte must not change the
    decode (interleaved geometry would desync: 24x8 has 3 blocks in raster
    order but 2x4=8 under 2x2 MCU interleave)."""
    img = _gradient_gray(8, 24)
    enc = bytearray(encode_jpeg(img, quality=90))
    i = enc.find(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1) -> hv at +11
    assert enc[i + 11] == 0x11
    enc[i + 11] = 0x22
    patched = decode_jpeg(bytes(enc))
    assert np.array_equal(patched, decode_jpeg(encode_jpeg(img, quality=90)))


def test_truncated_entropy_segment_raises():
    b = encode_jpeg(_gradient_gray(32, 32), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(b[: len(b) // 2])


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), np.int32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))


def test_decode_image_dispatches_jpeg():
    from hdfs2cass_spark.operators.mmcodec import decode_image

    img = np.full((10, 14), 50, np.uint8)
    w, h, mean = decode_image(encode_jpeg(img, quality=85))
    assert (w, h) == (14, 10)
    from hdfs2cass_spark.plans.image import predicted_gray

    assert mean == float(predicted_gray(50))


def test_resize_image_roundtrips_jpeg():
    from hdfs2cass_spark.operators.mmcodec import decode_image, resize_image

    img = _gradient_rgb(32, 32)
    out = resize_image(encode_jpeg(img, quality=90), 16, 8)
    w, h, _ = decode_image(out)
    assert (w, h) == (16, 8)
    assert out[:2] == b"\xff\xd8"


def test_safe_grays_cover_most_levels():
    from hdfs2cass_spark.plans.image import SAFE_GRAYS, predicted_gray

    assert len(SAFE_GRAYS) >= 240  # excluding only the rounding-boundary levels
    # prediction is idempotent under clipping and stays in range
    assert all(0 <= predicted_gray(g) <= 255 for g in SAFE_GRAYS)
