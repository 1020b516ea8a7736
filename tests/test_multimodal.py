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
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        extract_features(media, decode_stub=False).collect()


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
