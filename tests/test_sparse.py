"""Sparse vector search: representation invariants, scorer parity
with a pure-Python model, and the scale-critical plan shape (query
map broadcast, corpus scored map-side, top-k as TakeOrdered)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.operators import sparse as sp
from unified_vector_database_spark.plans.asserts import (
    assert_take_ordered, plan_text,
)


def _py_sparse(text: str) -> dict[int, float]:
    counts: dict[int, int] = {}
    for t in text.strip().split(" "):
        if not t:
            continue
        dim = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % sp.SPARSE_DIM
        counts[dim] = counts.get(dim, 0) + 1
    return {d: math.log(1 + c) for d, c in counts.items()}


def test_sparse_vectors_sorted_aligned_and_model_equal(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    rows = {r.doc_id: r for r in sp.sparse_vectors(docs).collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert rows.keys() == texts.keys()
    for doc_id, r in list(rows.items())[:50]:
        assert list(r.indices) == sorted(r.indices), "indices not sorted"
        assert len(r.indices) == len(r.values), "misaligned arrays"
        model = _py_sparse(texts[doc_id])
        got = dict(zip(r.indices, r.values))
        assert got.keys() == model.keys()
        for d in model:
            assert abs(got[d] - model[d]) < 1e-12


def test_knn_sparse_ordering_and_query_doc_scored(spark, sf_dir):
    top = sp.knn_sparse(spark, sf_dir).collect()
    assert len(top) > 0
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True)
    # the dot product is unnormalized (common-token dims dominate), so
    # doc 0 need not be in the top-k — but it must score > 0 against
    # itself in the full score table
    all_scores = {r.doc_id: r.score
                  for r in sp.sparse_scores(spark, sf_dir).collect()}
    assert all_scores[0] > 0


def test_knn_sparse_scores_match_python_brute(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    q = _py_sparse(texts[0])
    got = {r.doc_id: r.score for r in sp.knn_sparse(spark, sf_dir).collect()}
    for doc_id, score in got.items():
        model = sum(w * q[d] for d, w in _py_sparse(texts[doc_id]).items()
                    if d in q)
        assert abs(score - round(model, 6)) < 1e-9


def test_knn_sparse_plan_takeordered_and_broadcast_query(spark, sf_dir):
    text = plan_text(sp.knn_sparse(spark, sf_dir))
    assert_take_ordered(sp.knn_sparse(spark, sf_dir))
    # the 1-row query map reaches the corpus via broadcast, never a
    # shuffled join
    assert "BroadcastNestedLoopJoin" in text or "BroadcastExchange" in text


def test_hybrid_sparse_dense_nonempty_and_bounded(spark, sf_dir):
    out = sp.hybrid_sparse_dense(spark, sf_dir).collect()
    assert 0 < len(out) <= 15
    assert all(0.0 <= r.hybrid_score <= 1.0 + 1e-9 for r in out)
