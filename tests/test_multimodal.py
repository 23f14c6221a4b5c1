"""Multimodal plumbing: Arrow batch contract, deterministic stub
decoder, gated real decoders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysql2neo4j_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    _fake_decode,
    extract_features,
    frame_sample,
    media_from_documents,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    return media_from_documents(docs)


def test_media_schema(media):
    row = media.first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.content)


def test_features_match_python_recompute(spark, media):
    feats = {r.media_id: r for r in extract_features(media).collect()}
    for r in media.collect():
        f = feats[r.media_id]
        content = bytes(r.content)
        assert f.n_bytes == len(content)
        assert f.byte_sum_mod == sum(content) % 997
        assert f.first_byte == content[0]
        assert f.feature == _fake_decode(content)
    assert extract_features(media).schema == FEATURE_SCHEMA


def test_real_decoder_gated(media):
    with pytest.raises(NotImplementedError, match="pillow|media"):
        extract_features(media, decoder="pillow")


def test_frame_sample_explodes_video(spark):
    rows = [(1, "video", bytearray(b"xx"), ("video/mp4", 2, None, None, 3500))]
    from pysql2neo4j_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    frames = frame_sample(df, every_ms=1000).collect()
    assert [r.frame_ms for r in frames] == [0, 1000, 2000, 3000]
