"""Round-3 operators: duplicate spans, distance matrix, gap-filled
date histogram, pipeline aggs, WAV audio decode. Oracle parity is
covered by test_oracle_parity; these tests pin the SEMANTICS."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from unified_vector_database_spark.operators.matrix import (
    MATRIX_SAMPLE, MATRIX_TOPK, distance_matrix,
)
from unified_vector_database_spark.operators.multimodal import decode_wav
from unified_vector_database_spark.operators.spans import span_stats
from unified_vector_database_spark.operators.timeseries import (
    events_gap_fill, events_moving_avg,
)


def test_span_stats_flags_shared_spans(spark):
    shared = "a b c d e f g h"  # exactly one 8-token window
    docs = spark.createDataFrame(
        [(1, shared + " tail1 x y z"),
         (2, "lead2 " + shared),
         (3, "entirely different words with no overlap at all ok"),
         (4, "short doc")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in span_stats(docs).collect()}
    assert out[1].n_dup_windows == 1 and out[2].n_dup_windows == 1
    assert out[3].n_dup_windows == 0
    # doc 3: 9 tokens -> 2 windows; doc 4: under 8 tokens -> 0 windows
    assert out[3].n_windows == 2
    assert out[4].n_windows == 0 and out[4].dup_ratio == 0.0
    assert out[1].dup_ratio == round(1 / out[1].n_windows, 6)


def test_distance_matrix_shape(spark, sf_dir):
    rows = distance_matrix(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r.id_a, []).append(r)
    assert len(per) == MATRIX_SAMPLE
    for members in per.values():
        assert [m.rank for m in members] == list(range(1, MATRIX_TOPK + 1))
        scores = [m.score for m in members]
        assert scores == sorted(scores, reverse=True)
        assert all(m.id_b != m.id_a for m in members)


def test_gap_fill_emits_empty_buckets(spark, sf_dir):
    out = events_gap_fill(spark, sf_dir)
    rows = out.collect()
    hours = sorted({r.bucket for r in rows})
    types = sorted({r.event_type for r in rows})
    # full dense grid: every hour x every type exactly once
    assert len(rows) == len(hours) * len(types)
    steps = {(b - a).total_seconds() for a, b in zip(hours, hours[1:])}
    assert steps == {3600.0}
    # zero-filled buckets exist at sf0.001 (sparse corpus) and carry 0s
    zeros = [r for r in rows if r.n == 0]
    assert zeros and all(r.total_value == 0.0 for r in zeros)


def test_moving_avg_windows(spark, sf_dir):
    rows = events_moving_avg(spark, sf_dir).collect()
    series = [r for r in rows if r.event_type == rows[0].event_type]
    assert series[0].delta is None
    assert series[0].ma7 == series[0].revenue
    assert series[0].cum_revenue == series[0].revenue
    if len(series) > 1:
        assert series[1].delta == round(
            series[1].revenue - series[0].revenue, 6)
        assert series[1].cum_revenue == round(
            series[0].revenue + series[1].revenue, 6)
        assert series[1].ma7 == round(
            (series[0].revenue + series[1].revenue) / 2, 6)


def _wav(samples, rate=8000, extra_chunk=False):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # decoders must skip unknown chunks
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_real_bytes():
    s = [0, 1000, -1000, 32767, -32768, 0, 5, -5]
    out = decode_wav(_wav(s, rate=44100, extra_chunk=True))
    assert out["sample_rate"] == 44100
    assert out["n_samples"] == len(s)
    assert out["peak"] == 32768
    rms = (sum(x * x for x in s) / len(s)) ** 0.5
    assert out["rms"] == round(rms, 6)
    # sign transitions: 0->1000 no (0 counts as >=0), 1000->-1000 yes,
    # -1000->32767 yes, 32767->-32768 yes, -32768->0 yes, 0->5 no, 5->-5 yes
    assert out["zero_cross"] == 5


def test_wav_rejects_garbage():
    try:
        decode_wav(b"not a wav file at all")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_wav_synth_decode_roundtrip(spark, sf_dir):
    # the Spark-side synth bytes decode to the features the PCM hex
    # implies — checked directly in Python for one known doc
    import hashlib

    from unified_vector_database_spark import tables
    from unified_vector_database_spark.operators.multimodal import synth_wav

    docs = tables.load(spark, sf_dir, "documents").limit(5)
    rows = {r.doc_id: r.text for r in docs.collect()}
    media = {r.media_id: bytes(r.payload)
             for r in synth_wav(docs).collect()}
    for doc_id, text in rows.items():
        hexpcm = "".join(
            hashlib.md5((text + s).encode()).hexdigest()
            for s in ("", "a", "b", "c"))
        pcm = bytes.fromhex(hexpcm)
        payload = media[doc_id]
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        assert payload[-64:] == pcm  # data chunk carries the exact PCM
        out = decode_wav(payload)
        samples = [int.from_bytes(pcm[2 * i:2 * i + 2], "little",
                                  signed=True) for i in range(32)]
        assert out["peak"] == max(abs(s) for s in samples)
        assert out["rms"] == round(
            (sum(s * s for s in samples) / 32) ** 0.5, 6)


def test_distance_matrix_small_corpus(spark, tmp_path):
    # corpus smaller than the sample size: every point still gets
    # rows, ranks stay dense, nobody pairs with themselves
    import pyspark.sql.functions as F

    from unified_vector_database_spark import tables
    from unified_vector_database_spark.operators import matrix as M

    sf = str(tmp_path / "mini")
    import os
    os.makedirs(sf, exist_ok=True)
    emb = tables.load(spark, os.environ.get(
        "UVDB_TEST_SF_DIR", "/root/testdata/sf0.001"), "embeddings")
    emb.limit(4).write.parquet(f"{sf}/embeddings.parquet")
    rows = M.distance_matrix(spark, sf).collect()
    per = {}
    for r in rows:
        per.setdefault(r.id_a, []).append(r)
    assert len(per) == 4
    for members in per.values():
        assert [m.rank for m in members] == [1, 2, 3]
