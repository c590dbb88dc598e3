"""Baseline JFIF encode/decode (SURVEY §2.7 M2 codec path): the
decoder parses real JPEG bytes — markers, stream-defined Huffman
tables, byte stuffing, DC prediction — and the round trip is bounded
by quantization error only."""

from __future__ import annotations

import numpy as np
import pytest

from unified_vector_database_spark.operators.jpeg import (
    JPG_H, JPG_W, decode_jpeg_gray, encode_jpeg_gray,
)


def _gradient(h=8, w=8):
    return np.array([[(16 * y + 2 * x) % 256 for x in range(w)]
                     for y in range(h)], dtype=np.int64)


def test_structure_markers():
    jpg = encode_jpeg_gray(_gradient())
    assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda",
                   b"\xff\xe0"):
        assert marker in jpg


def test_roundtrip_quant_error_bound():
    px = _gradient(16, 16)
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    assert (dec["width"], dec["height"]) == (16, 16)
    err = np.abs(dec["pixels"] - px)
    # error is bounded by the quant tables; Annex K luminance at this
    # block content stays well under half the largest quant step
    assert err.max() <= 40
    assert err.mean() <= 10


def test_flat_block_is_exact():
    # a flat 128 block has DC=0 and all ACs 0 -> lossless round trip
    px = np.full((8, 8), 128, dtype=np.int64)
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    assert (dec["pixels"] == 128).all()
    assert dec["dc_qs"] == [0]


def test_dc_closed_form_and_prediction():
    # quantized DC per MCU == round_half_away((sum-8192)/128): the
    # oracle's closed form, across the multi-MCU DC-prediction chain
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(JPG_H, JPG_W)).astype(np.int64)
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    got = dec["dc_qs"]
    exp = []
    for i in range(JPG_W * JPG_H // 64):
        bx, by = i % (JPG_W // 8), i // (JPG_W // 8)
        s = int(px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8].sum())
        x = (s - 8192) / 128.0
        exp.append(int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5)))
    assert got == exp


def test_determinism_and_stuffing_safe():
    # byte stuffing: encoders emitting 0xFF in the entropy stream must
    # unstuff cleanly; hammer many random blocks through the round trip
    rng = np.random.RandomState(11)
    for _ in range(25):
        px = rng.randint(0, 256, size=(8, 16)).astype(np.int64)
        j1, j2 = encode_jpeg_gray(px), encode_jpeg_gray(px)
        assert j1 == j2
        dec = decode_jpeg_gray(j1)
        assert dec["pixels"].shape == (8, 16)


def test_rejects_non_baseline():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"NOPE")
    jpg = bytearray(encode_jpeg_gray(_gradient()))
    sof = jpg.find(b"\xff\xc0")
    jpg[sof + 1] = 0xC2  # rewrite SOF0 -> progressive SOF2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_gray(bytes(jpg))


def test_query_matches_kernel(spark, sf_dir):
    from unified_vector_database_spark.operators.jpeg import (
        jpeg_image_features,
    )
    rows = jpeg_image_features(spark, sf_dir).limit(20).collect()
    assert len(rows) == 20
    assert all(r.width == JPG_W and r.height == JPG_H for r in rows)
    # dc range sanity: mean byte 127.5 -> dc_q near 0, always in int8
    assert all(-70 <= r.dc_q0 <= 70 and -70 <= r.dc_q1 <= 70
               for r in rows)
