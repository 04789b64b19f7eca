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


def test_codec_seam_injection(spark):
    """A custom codec injected via ``codec=`` must actually be used —
    the swap-in path a PIL/ffmpeg deployment takes. (get_codec() falls
    back to FakeCodec here: no Pillow in this container.)"""
    from mrgo_spark.operators import multimodal as mm
    from mrgo_spark.sources.tables import load_table

    assert mm.get_codec() is mm.FakeCodec

    class MarkerCodec:
        @staticmethod
        def decode_features(blob, dim=8):
            return [42.0] * dim

        @staticmethod
        def thumbnail_bytes(blob, w=4, h=4):
            return b"\x2a" * (w * h)

    media = mm.synth_media(
        spark, load_table(spark, "/root/testdata/sf0.001", "embeddings")
    ).limit(6)
    feats = mm.extract_features(media, dim=4, codec=MarkerCodec).collect()
    assert feats and all(r.features == [42.0] * 4 for r in feats)
    thumbs = mm.resize_thumbnails(media, 2, 2, codec=MarkerCodec).collect()
    assert thumbs and all(bytes(r.thumb) == b"\x2a" * 4 for r in thumbs)
