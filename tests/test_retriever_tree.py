"""Composition pair (r6 session 2): the ES retriever tree and the
Weaviate Aggregate-with-nearVector — contract checks beyond the
oracle hash (stage consistency with the ops they compose, and plan
shape)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_retriever_tree_consistent_with_components(spark, sf_dir):
    """The tree's rrf_score column must agree with hybrid_rrf for the
    docs both return, and its ce_score with rerank_inference's model
    (same stub cross-encoder)."""
    from unified_vector_database_spark.operators.inference import (
        _load_stub_cross_encoder,
    )
    from unified_vector_database_spark.registry import QUERIES, load_all
    load_all()
    tree = {r.doc_id: r for r in
            QUERIES["retriever_tree"](spark, sf_dir).collect()}
    assert len(tree) == 10
    rrf = {r.doc_id: r.rrf_score for r in
           QUERIES["hybrid_rrf"](spark, sf_dir).collect()}
    overlap = set(tree) & set(rrf)
    assert overlap  # the fused head and the rrf page share docs
    for d in overlap:
        assert tree[d].rrf_score == pytest.approx(rrf[d], abs=1e-9)
    # ce scores reproduce the per-partition model exactly
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
                 .where(F.col("doc_id").isin(list(tree))).collect()}
    model = _load_stub_cross_encoder()
    for d, r in tree.items():
        assert r.ce_score == pytest.approx(model(d, docs[d]), abs=2e-6)
    # reranker changed the order vs pure rrf (otherwise the stage is
    # dead weight) — at least one doc outside the rrf top-10 page
    assert set(tree) != set(rrf)


def test_near_vector_aggregate_against_numpy(spark, sf_dir):
    from unified_vector_database_spark.operators.knn import NV_AGG_CERTAINTY
    from unified_vector_database_spark.registry import QUERIES, load_all
    load_all()
    got = {r.label: r for r in
           QUERIES["near_vector_aggregate"](spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    x = np.array([r.embedding for r in emb], dtype=np.float64)
    q = x[[r.vec_id for r in emb].index(0)]
    cert = (1.0 + (x @ q) / (np.linalg.norm(x, axis=1)
                             * np.linalg.norm(q))) / 2.0
    labels = np.array([r.label for r in emb])
    mask = cert >= NV_AGG_CERTAINTY
    assert set(got) == set(labels[mask].tolist())
    for lb in got:
        c = cert[mask & (labels == lb)]
        assert got[lb].n == len(c)
        assert got[lb].min_certainty == pytest.approx(c.min(), abs=2e-6)
        assert got[lb].max_certainty == pytest.approx(c.max(), abs=2e-6)
        assert got[lb].mean_certainty == pytest.approx(c.mean(), abs=2e-6)


def test_near_vector_aggregate_no_corpus_sort(spark, sf_dir):
    from unified_vector_database_spark.registry import QUERIES, load_all
    load_all()
    df = QUERIES["near_vector_aggregate"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # census shape: no window, one partial agg (the only sort is the
    # |labels|-row output ordering)
    assert "WindowExec" not in plan
    assert "HashAggregate" in plan
