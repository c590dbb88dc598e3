"""Dedup invariants: identical content -> identical signatures;
Jaccard bounds; LSH candidates are a superset of true near-dups at
the banding threshold."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from unified_vector_database_spark.operators.dedup import (
    lsh_candidate_pairs, minhash_signatures, shingle_sets,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)])


def test_identical_docs_identical_sigs(spark):
    txt = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [txt, txt, "completely different words here now"])
    sig = {r.doc_id: tuple(r)[1:]
           for r in minhash_signatures(docs).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[2]


def test_identical_docs_become_candidates(spark):
    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [txt, txt, "one two three four five six seven"])
    pairs = {(r.id_a, r.id_b)
             for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_shingle_sets(spark):
    docs = _docs(spark, ["a b c d"])
    got = sorted(r.shingle for r in shingle_sets(docs).collect())
    assert got == ["a b c", "b c d"]


def test_near_dup_detected(spark):
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"
    near = base.replace("w15", "w15x")  # one token changed
    docs = _docs(spark, [base, near])
    pairs = {(r.id_a, r.id_b)
             for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()}
    assert (0, 1) in pairs  # 13/15 shared shingles -> banding fires
