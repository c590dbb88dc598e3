"""Multimodal columns (SURVEY §2.7): image/audio/video as opaque
`binary` columns with typed metadata structs, plus Arrow-batched
decode/feature plumbing via mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
container — see decode_binary_batches); the Spark-side contract —
schema, batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .. import tables
from ..registry import register

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]), True),
])


def to_media(df: DataFrame, id_col: str, payload_col: str,
             mime: str) -> DataFrame:
    """Wrap any binary column into the canonical media record."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload_col).cast("long").alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("checksum"),
        ).alias("meta"))


FEATURE_SCHEMA = ("media_id long, n_bytes long, feat_dim int, "
                  "feat_head array<double>")


def decode_binary_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per-Arrow-batch 'decode' of binary payloads
    into fixed-width features. Real decode (PIL/librosa/av) is not
    available in this container, so the feature extractor is a
    deterministic fake (byte-histogram head); swap `_fake_decode` for
    the real library call in production.
    """
    for pdf in it:
        feats = pdf["payload"].map(_fake_decode)
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
            "feat_dim": 4,
            "feat_head": feats,
        })


def _fake_decode(payload: bytes | None) -> list[float]:
    if payload is None:
        return [0.0, 0.0, 0.0, 0.0]
    n = max(len(payload), 1)
    # deterministic stand-in for decode+pool: moments of the byte stream
    s = sum(payload)
    return [float(len(payload)), float(payload[0]), float(payload[-1]),
            round(s / n, 6)]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the media table; one
    Python worker per partition, vectorized batch transfer."""
    return media.mapInPandas(decode_binary_batches, schema=FEATURE_SCHEMA)


@register("binary_meta", oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS checksum
FROM documents ORDER BY doc_id
""")
def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata: documents' text re-encoded as
    the payload bytes (the container ships no real media files). The
    Spark side hashes the BINARY column; the oracle hashes the same
    bytes — identical digests prove the binary plumbing is lossless."""
    docs = tables.load(spark, sf_dir, "documents")
    media = to_media(docs.withColumn("payload", F.encode("text", "UTF-8")),
                     "doc_id", "payload", "text/plain")
    return (media.select(F.col("media_id").alias("doc_id"),
                         F.col("meta.n_bytes").alias("n_bytes"),
                         F.col("meta.checksum").alias("checksum"))
                 .orderBy("doc_id"))
