"""Multimodal plumbing tests: schema, batching, explode shape — with the
stubbed decoders (no media libs in this container)."""

from __future__ import annotations

from pyspark.sql import Row

from surrealdb_spark.pipeline.multimodal import (
    attach_media,
    extract_features,
    resize_images,
    sample_frames,
)


def _media(spark):
    rows = [Row(id=i, payload=bytes(range(i, i + 64))) for i in range(1, 4)]
    return spark.createDataFrame(rows, schema="id long, payload binary")


def test_attach_and_features(spark):
    df = attach_media(_media(spark), "payload", "image/png", width=32, height=32)
    assert "media_meta" in df.columns
    feat = extract_features(df, "payload", n_features=8)
    rows = feat.orderBy("id").collect()
    assert len(rows) == 3
    assert len(rows[0].features) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[0].features)
    again = extract_features(df, "payload", n_features=8).orderBy("id").collect()
    assert rows[0].features == again[0].features  # deterministic fake


def test_resize_updates_meta(spark):
    df = attach_media(_media(spark), "payload", "image/png", width=64, height=64)
    out = resize_images(df, "payload", 16, 16).first()
    assert out.media_meta.width == 16 and out.media_meta.height == 16
    assert out.payload is not None  # stub passes payload through


def test_sample_frames_explodes(spark):
    df = _media(spark)
    frames = sample_frames(df, "payload", every_ms=1000)
    got = frames.orderBy("id", "frame_idx").collect()
    assert {r.id for r in got} == {1, 2, 3}
    assert max(r.frame_idx for r in got) == 3  # 64 bytes / 16 = 4 fake frames
    assert all(isinstance(r.frame, (bytes, bytearray)) for r in got)
