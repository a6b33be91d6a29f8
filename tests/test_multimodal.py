"""Multimodal plumbing tests: schema, Arrow batch shape, metadata pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.operators import multimodal as mm


def test_decode_image_runs_batched(spark):
    media = mm.synth_media(spark, 128)
    out = mm.decode_image(media)
    rows = out.collect()
    assert len(rows) == 128
    assert out.schema == mm.DECODED_IMAGE_SCHEMA
    for r in rows:
        assert 16 <= r.height < 64 and 16 <= r.width < 64
        assert 0.0 <= r.mean_luma <= 1.0
        assert r.n_bytes == 64  # sha2-256 hex → 64 bytes as binary-cast string


def test_decode_is_deterministic(spark):
    a = sorted(map(tuple, mm.decode_image(mm.synth_media(spark, 32)).collect()))
    b = sorted(map(tuple, mm.decode_image(mm.synth_media(spark, 32)).collect()))
    assert a == b


def test_filter_by_meta_prunes_payload(spark):
    media = mm.synth_media(spark, 16)
    out = mm.filter_by_meta(media, media_type="image", min_width=64)
    assert out.count() == 16
    assert mm.filter_by_meta(media, media_type="video").count() == 0
    # metadata-only projection must not reference payload in the plan
    plan = mm.filter_by_meta(media, media_type="image").select(
        "media_id", "meta"
    )._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_sample_frames(spark):
    vids = spark.range(2).select(
        F.col("id").alias("media_id"),
        F.lit(b"x").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("mp4").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(3500).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    frames = mm.sample_frames(vids, every_ms=1000).collect()
    # 0,1000,2000,3000 per video
    assert len(frames) == 8
    assert {f.frame_ts_ms for f in frames} == {0, 1000, 2000, 3000}


def test_resize_images_binary_roundtrip(spark):
    """resize emits binary payloads (Arrow binary both directions), bounded
    dimensions, deterministic output."""
    media = mm.synth_media(spark, 32)
    out = mm.resize_images(media, max_side=24)
    rows = out.collect()
    assert len(rows) == 32
    assert out.schema == mm.RESIZED_IMAGE_SCHEMA
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) > 0
        assert 1 <= r.width <= 24 and 1 <= r.height <= 24
    again = sorted(map(tuple, mm.resize_images(media, max_side=24).collect()))
    assert again == sorted(map(tuple, rows))


def test_audio_features(spark):
    out = mm.extract_audio_features(mm.synth_media(spark, 64))
    rows = out.collect()
    assert len(rows) == 64
    assert out.schema == mm.DECODED_AUDIO_SCHEMA
    for r in rows:
        assert 1000 <= r.n_samples < 8000
        assert 0.0 <= r.rms <= 1.0
        assert r.clipped >= 0
