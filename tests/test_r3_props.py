"""Property tests (hypothesis) for round-3 kernels: Morton interleave
round-trips, ngram windows are well-formed, WAV decode inverts the
synth encoder for arbitrary PCM."""

from __future__ import annotations

import struct

from hypothesis import given, settings, strategies as st

from unified_vector_database_spark.operators.multimodal import decode_wav


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def _deinterleave(z: int, bits: int = 16) -> tuple[int, int]:
    a = b = 0
    for i in range(bits):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@given(st.integers(0, 2 ** 16 - 1), st.integers(0, 2 ** 16 - 1))
def test_morton_roundtrip_py(a, b):
    assert _deinterleave(_morton_py(a, b)) == (a, b)


def test_morton_spark_matches_python(spark):
    import pyspark.sql.functions as F

    from unified_vector_database_spark.sources.io import morton_code

    vals = [(3, 5), (0, 0), (65535, 65535), (1, 65534), (40000, 123)]
    df = spark.createDataFrame(vals, "a long, b long")
    got = {(r.a, r.b): r.z for r in df.select(
        "a", "b", morton_code(F.col("a"), F.col("b")).alias("z")).collect()}
    for a, b in vals:
        assert got[(a, b)] == _morton_py(a, b)


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=50, deadline=None)
def test_wav_decode_arbitrary_pcm(samples, rate):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    payload = (b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data))
               + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
    out = decode_wav(payload)
    assert out["n_samples"] == len(samples)
    assert out["sample_rate"] == rate
    assert out["peak"] == max(abs(s) for s in samples)
    n = len(samples)
    assert out["rms"] == round(
        (sum(s * s for s in samples) / n) ** 0.5, 6)
    zc = sum(1 for i in range(1, n)
             if (samples[i - 1] < 0) != (samples[i] < 0))
    assert out["zero_cross"] == zc


def test_ngram_windows_well_formed(spark):
    import pyspark.sql.functions as F

    from unified_vector_database_spark.functions.text import ngram_array

    texts = ["", "a", "a b c", "a b c d e f g h i j",
             "x " * 30, "dup dup dup dup dup dup dup dup dup"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    rows = df.select("doc_id", "text",
                     ngram_array(F.col("text"), 8).alias("g")).collect()
    for r in rows:
        n_tok = len([t for t in r.text.strip().split(" ") if t])
        expected_max = max(n_tok - 7, 0)
        assert len(r.g) <= expected_max
        assert len(set(r.g)) == len(r.g)  # distinct by construction
        for gram in r.g:
            assert len(gram.split(" ")) == 8
