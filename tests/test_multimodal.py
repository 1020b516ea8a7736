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
