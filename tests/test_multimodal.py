"""Multimodal plumbing: schema, batch shape, determinism (decode is
a documented stub — FakeCodec — per the build mandate)."""

from __future__ import annotations

from mrgo_spark.operators import multimodal
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _media(spark):
    return multimodal.synth_media(spark, load_table(spark, SF, "embeddings"))


def test_extract_features_shape_and_determinism(spark):
    media = _media(spark)
    out = multimodal.extract_features(media, dim=8)
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(len(r.features) == 8 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.features)
    again = {r.media_id: r.features for r in multimodal.extract_features(media, dim=8).collect()}
    assert all(again[r.media_id] == r.features for r in rows)


def test_thumbnails(spark):
    out = multimodal.resize_thumbnails(_media(spark), w=4, h=4).collect()
    assert all(len(r.thumb) == 16 for r in out)
    assert all(r.thumb_w == 4 and r.thumb_h == 4 for r in out)


def test_frame_sample_only_videos(spark):
    media = _media(spark)
    n_videos = media.filter("kind = 'video'").count()
    out = multimodal.frame_sample(media, every_ms=1000)
    rows = out.collect()
    assert {r.media_id for r in rows} == {
        r.media_id for r in media.filter("kind = 'video'").collect()
    }
    assert len(rows) >= n_videos  # ≥1 frame per video
    assert all(isinstance(r.frame, (bytes, bytearray)) for r in rows)
