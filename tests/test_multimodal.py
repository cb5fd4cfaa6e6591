"""Multimodal plumbing: binary payload schema, Arrow-batched feature
extraction parity with the plain-Python fake decoder."""

from __future__ import annotations

from realtime_twitter_trends_analytics_spark.operators.multimodal import (
    _fake_decode_features,
    media_table,
    multimodal_features,
)


def test_media_table_schema_and_bytes(spark, sf_dir):
    media = media_table(spark, sf_dir)
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "n_bytes": "bigint",
    }
    row = media.orderBy("doc_id").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_feature_extraction_matches_python(spark, sf_dir):
    feats = {r["doc_id"]: r for r in multimodal_features(spark, sf_dir).collect()}
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media_table(spark, sf_dir).collect()}
    assert len(feats) == len(payloads)
    for doc_id in list(payloads)[:25]:
        mean, bmin, bmax, checksum = _fake_decode_features(payloads[doc_id])
        got = feats[doc_id]
        assert got["byte_mean"] == round(mean, 4)
        assert got["byte_min"] == bmin
        assert got["byte_max"] == bmax
        assert got["frame_checksum"] == checksum


def test_media_type_partitioning(spark, sf_dir):
    media = media_table(spark, sf_dir)
    kinds = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert kinds == {"image/fake", "audio/fake"}
