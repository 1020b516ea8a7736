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
