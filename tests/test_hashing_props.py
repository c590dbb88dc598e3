"""Property tests (hypothesis) for the cross-engine hash kernels: the
Spark expressions must equal an independent pure-Python model on
arbitrary inputs, not just the corpus."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row, functions as F

from unified_vector_database_spark.constants import (
    FP_LEN, FP_MOD, FP_POW, MINHASH_A, MINHASH_B, MINHASH_P,
)
from unified_vector_database_spark.functions.hashing import (
    md5_int32, minhash_perm, rolling_fingerprint,
)

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=100)
# min_size=0: the empty string is a valid document (fp must be 0, not
# an INVALID_INDEX_OF_ZERO crash — ADVICE r1)
TEXT0 = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=100)


def _py_md5_int32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_fingerprint(s: str) -> int:
    total = 0
    for i, ch in enumerate(s[:FP_LEN]):
        total += ord(ch) * FP_POW[i]
    return total % FP_MOD


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8, unique=True))
def test_md5_int32_matches_python(spark, texts):
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(texts)])
    got = {r.i: r.h for r in
           df.select("i", md5_int32("s").alias("h")).collect()}
    for i, s in enumerate(texts):
        assert got[i] == _py_md5_int32(s)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT0, min_size=1, max_size=8, unique=True))
def test_fingerprint_matches_python(spark, texts):
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(texts)])
    got = {r.i: r.fp for r in
           df.select("i", rolling_fingerprint("s").alias("fp")).collect()}
    for i, s in enumerate(texts):
        assert got[i] == _py_fingerprint(s)


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 32) - 1))
def test_minhash_perm_bounds_and_model(spark, h):
    df = spark.createDataFrame([Row(h=h)])
    row = df.select(*[minhash_perm(F.col("h"), j).alias(f"m{j}")
                      for j in range(len(MINHASH_A))]).first()
    for j in range(len(MINHASH_A)):
        expect = (MINHASH_A[j] * h + MINHASH_B[j]) % MINHASH_P
        assert row[f"m{j}"] == expect
        assert 0 <= row[f"m{j}"] < MINHASH_P


# ---------------------------------------------------------------- chunking
from unified_vector_database_spark.operators.textops import (
    CHUNK_SIZE, CHUNK_STRIDE,
)

DOC = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
              min_size=1, max_size=900)


@settings(max_examples=20, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=4))
def test_chunking_covers_document_exactly(spark, docs):
    """Invariants of sliding-window chunking, on arbitrary text:
    (a) concatenating chunk prefixes of length `stride` (plus the
        final chunk) reconstructs the document exactly — full
        coverage, no gaps;
    (b) every chunk except the last has length CHUNK_SIZE or the
        document is shorter than CHUNK_SIZE;
    (c) consecutive chunks overlap by exactly size - stride chars."""
    from pyspark.sql import Row
    from unified_vector_database_spark.operators import textops
    import unified_vector_database_spark.tables as tables_mod

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate(docs)])
    orig_load = tables_mod.load_parallel
    tables_mod.load_parallel = lambda sp, sf, name, key: df
    try:
        out = textops.chunk_sliding(spark, "unused").collect()
    finally:
        tables_mod.load_parallel = orig_load

    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        # (a) reconstruct
        rebuilt = "".join(c.chunk[:CHUNK_STRIDE] for c in chunks[:-1])
        rebuilt += chunks[-1].chunk
        assert rebuilt == t, (len(rebuilt), len(t))
        # (b) full-size interior chunks
        for c in chunks[:-1]:
            assert c.chunk_len == CHUNK_SIZE
        # (c) overlap
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk[CHUNK_STRIDE:] == b.chunk[:CHUNK_SIZE - CHUNK_STRIDE]
