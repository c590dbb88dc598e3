"""Pipeline-analytics trio (r6 session 2): quality_pr_curve,
embedding_decontaminate, ngram_entropy — property checks against
independent python/numpy models (the oracle hash proves cross-engine
equality; these prove the MATH is right)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_pr_curve_properties(spark, sf_dir):
    from unified_vector_database_spark.registry import QUERIES, load_all
    load_all()
    rows = QUERIES["quality_pr_curve"](spark, sf_dir).collect()
    assert len(rows) == 7
    # tp+fn is the positive count — constant across thresholds
    pos = {r.tp + r.fn for r in rows}
    assert len(pos) == 1
    # recall is non-increasing as the threshold rises; tp non-increasing
    recalls = [r.recall for r in rows]
    tps = [r.tp for r in rows]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    assert all(a >= b for a, b in zip(tps, tps[1:]))
    # F1 is the harmonic mean wherever both parts exist
    for r in rows:
        if r.precision and r.recall:
            h = 2 * r.precision * r.recall / (r.precision + r.recall)
            assert r.f1 == pytest.approx(h, abs=2e-6)


def test_pr_curve_fused_single_scan(spark, sf_dir):
    """The quality score is fused into gopher_keep's projection — the
    plan must contain exactly ONE documents scan (no doc_id re-join of
    two corpus-sized frames)."""
    from unified_vector_database_spark.registry import QUERIES, load_all
    load_all()
    df = QUERIES["quality_pr_curve"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1
    assert "SortMergeJoin" not in plan


def test_embedding_decontaminate_against_numpy(spark, sf_dir):
    from unified_vector_database_spark.operators.cleanup import (
        EMB_DECON_CAP, EMB_DECON_MOD, EMB_DECON_TAU,
    )
    from unified_vector_database_spark.registry import QUERIES, load_all
    load_all()
    got = {r.vec_id: r for r in
           QUERIES["embedding_decontaminate"](spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in emb])
    x = np.array([r.embedding for r in emb], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    is_bench = (ids % EMB_DECON_MOD == 0) & (ids < EMB_DECON_CAP)
    sims = x[~is_bench] @ x[is_bench].T
    mx = sims.max(axis=1)
    hits = (sims >= EMB_DECON_TAU).sum(axis=1)
    order = sorted(range(len(mx)),
                   key=lambda i: (-round(mx[i], 6), ids[~is_bench][i]))
    top = order[:25]
    assert set(got) == {int(ids[~is_bench][i]) for i in top}
    for i in top:
        r = got[int(ids[~is_bench][i])]
        assert r.max_sim == pytest.approx(mx[i], abs=2e-6)
        assert r.n_hits == hits[i]
        assert r.contaminated == bool(mx[i] >= EMB_DECON_TAU)


def test_embedding_decontaminate_broadcasts_eval_side(spark, sf_dir):
    from unified_vector_database_spark.registry import QUERIES, load_all
    load_all()
    df = QUERIES["embedding_decontaminate"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_ngram_entropy_against_python(spark, sf_dir):
    import hashlib
    from collections import Counter

    from unified_vector_database_spark.operators.lm import ENT_BUCKETS
    from unified_vector_database_spark.registry import QUERIES, load_all
    load_all()
    got = {r.source: r for r in
           QUERIES["ngram_entropy"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    per_src: dict[str, Counter] = {}
    for d in docs:
        toks = [t for t in d.text.strip().split(" ") if t]
        c = per_src.setdefault(d.source, Counter())
        for a, b in zip(toks, toks[1:]):
            g = f"{a} {b}"
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            c[h % ENT_BUCKETS] += 1
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        n = sum(cnt.values())
        ent = -sum((c / n) * math.log2(c / n) for c in cnt.values())
        r = got[src]
        assert r.n_bigrams == n
        assert r.n_buckets == len(cnt)
        assert r.entropy == pytest.approx(ent, abs=2e-6)
        assert r.norm_entropy == pytest.approx(ent / 8.0, abs=2e-6)
        assert 0.0 <= r.norm_entropy <= 1.0
