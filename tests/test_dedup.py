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


def test_lsh_bucket_cap_bounds_adversarial_hot_bucket(spark):
    # adversarial corpus: 200 docs with IDENTICAL minhash signatures
    # (one hot bucket per band) + 30 distinct docs. Uncapped, the hot
    # bucket alone yields 200*199/2 = 19900 pairs; capped at 20 it
    # must contribute exactly C(20,2) = 190.
    from pyspark.sql import Row

    from unified_vector_database_spark.constants import LSH_ROWS
    from unified_vector_database_spark.operators.dedup import (
        _K, lsh_candidate_pairs,
    )

    hot = [Row(doc_id=i, **{f"m{j}": 7 for j in range(_K)})
           for i in range(200)]
    cold = [Row(doc_id=1000 + i, **{f"m{j}": 1000 + i * _K + j
                                    for j in range(_K)})
            for i in range(30)]
    sig = spark.createDataFrame(hot + cold)

    uncapped = lsh_candidate_pairs(sig).count()
    assert uncapped == 200 * 199 // 2

    cap = 20
    capped = lsh_candidate_pairs(sig, bucket_cap=cap)
    rows = capped.collect()
    assert len(rows) == cap * (cap - 1) // 2
    # deterministic survivors: the cap lowest ids
    ids = {r.id_a for r in rows} | {r.id_b for r in rows}
    assert ids == set(range(cap))
    n_bands = _K // LSH_ROWS
    assert n_bands > 1  # the cap must hold across multi-band dupes
