"""Multimodal plumbing: binary payload schema, mapInPandas featurization,
stub boundary behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    base = spark.range(20).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
    )
    return base.select(
        "media_id",
        "kind",
        mm.fake_media_col(F.col("media_id"), "media").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(100).alias("n_frames"),
        ).alias("meta"),
    )


def test_extract_features_shape_and_determinism(spark, media):
    feats = mm.extract_features(media, feature_dim=8).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["n_bytes"] > len(b"LSFAKE1:")
        assert len(r["checksum"]) == 16
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    again = mm.extract_features(media, feature_dim=8).collect()
    assert {r["media_id"]: r["checksum"] for r in feats} == {
        r["media_id"]: r["checksum"] for r in again
    }


def test_decode_stub_rejects_real_media(spark):
    with pytest.raises(NotImplementedError):
        mm._decode_payload(b"\x89PNG\r\n\x1a\n....")


def test_resize_updates_meta_only_for_images(spark, media):
    out = mm.resize_images(media, 64, 64)
    rows = out.collect()
    assert rows and all(r["kind"] == "image" for r in rows)
    assert all(r["meta"]["width"] == 64 and r["meta"]["height"] == 64 for r in rows)


def test_sample_frames(spark, media):
    out = mm.sample_frames(media, every_n=25).collect()
    videos = [r for r in media.collect() if r["kind"] == "video"]
    # frames 0,25,50,75 per video
    assert len(out) == 4 * len(videos)
