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
