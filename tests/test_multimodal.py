"""Multimodal plumbing (SURVEY §2.7): media schema, Arrow-batched
feature extraction with the stubbed decoder."""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.operators.multimodal import (
    extract_features, to_media,
)


def test_media_schema_and_features(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").limit(50)
    media = to_media(docs.withColumn("payload", F.encode("text", "UTF-8")),
                     "doc_id", "payload", "text/plain")
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    row = media.orderBy("media_id").first()
    assert row.meta.mime == "text/plain"
    assert row.meta.n_bytes == len(row.payload)
    assert len(row.meta.checksum) == 64  # sha-256 hex

    feats = extract_features(media)
    out = {r.media_id: r for r in feats.collect()}
    assert len(out) == 50
    r0 = out[row.media_id]
    assert r0.feat_dim == 4 and len(r0.feat_head) == 4
    assert r0.n_bytes == row.meta.n_bytes
    assert r0.feat_head[0] == float(row.meta.n_bytes)


def test_null_payload_handled(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, None)], "media_id long, payload binary")
    media = to_media(df, "media_id", "payload", "application/octet-stream")
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[2].feat_head == [0.0, 0.0, 0.0, 0.0]
    assert feats[1].n_bytes == 3


def test_ppm_decode_real_bytes():
    # hand-built 4x4 P6: known channel pattern -> exact means + pooled
    # grayscale thumbnail (the resize step)
    from unified_vector_database_spark.operators.multimodal import decode_ppm
    raster = bytes([r for p in range(16) for r in (p, 2 * p, 255 - p)])
    payload = b"P6\n4 4\n255\n" + raster
    out = decode_ppm(payload)
    assert (out["width"], out["height"], out["maxval"]) == (4, 4, 255)
    assert out["mean_r"] == round(sum(range(16)) / 16, 6)
    assert out["mean_g"] == round(sum(2 * p for p in range(16)) / 16, 6)
    assert out["mean_b"] == round(sum(255 - p for p in range(16)) / 16, 6)
    assert len(out["thumb"]) == 4  # 2x2 mean-pool of the 4x4 gray plane
    gray = [(p + 2 * p + (255 - p)) / 3.0 for p in range(16)]
    top_left = round((gray[0] + gray[1] + gray[4] + gray[5]) / 4.0, 6)
    assert out["thumb"][0] == top_left

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + raster[:10])
    with _pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_ppm_pipeline_end_to_end(spark, sf_dir):
    from unified_vector_database_spark.operators.multimodal import (
        ppm_image_features,
    )
    rows = ppm_image_features(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.width == 4 and r.height == 4 for r in rows)
    assert all(0.0 <= r.mean_r <= 255.0 for r in rows)


def test_video_container_decode_and_stride():
    from unified_vector_database_spark.operators.multimodal import (
        _FRAME_BYTES, sample_video_frames,
    )
    frames = [bytes([i] * _FRAME_BYTES) for i in range(4)]
    payload = b"PVID" + bytes([4]) + b"".join(frames)
    out = sample_video_frames(payload, stride=2)
    assert out["n_frames"] == 4 and out["n_sampled"] == 2
    assert out["frame_means"] == [0.0, 2.0]  # frames 0 and 2
    try:
        sample_video_frames(b"XXXX" + payload[4:])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    try:
        sample_video_frames(payload[:-1])
        raise AssertionError("expected ValueError on truncation")
    except ValueError:
        pass
