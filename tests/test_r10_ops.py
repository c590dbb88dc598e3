"""Round-6 r10-wave checks: independent Python re-derivations and
plan/property tests for the new ops (OPQ rotation + PQ, ES search_mvt
tiles, geo_shape envelope intersects, deterministic training shards,
Weaviate certainty cutoff, corpus drift KL, LSH band recall curve) —
the defect class the hash oracle cannot see when both engines share a
bug.
"""

from __future__ import annotations

import math

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------- opq_pq_knn

def test_opq_rotation_is_orthogonal_and_norm_preserving():
    import numpy as np

    from unified_vector_database_spark.operators.index import opq_fit

    rng = np.random.default_rng(7)
    x = rng.normal(size=(512, 64)) @ rng.normal(size=(64, 64))  # correlated
    mu, r = opq_fit(x)
    r = np.asarray(r)
    assert np.allclose(r @ r.T, np.eye(64), atol=1e-9)
    v = rng.normal(size=64)
    assert math.isclose(np.linalg.norm(r @ v), np.linalg.norm(v),
                        rel_tol=1e-12)
    # sign canonicalization: largest-|.| entry of each row positive
    for row in r:
        assert row[int(np.abs(row).argmax())] > 0


def test_opq_recall_vs_flat_l2(spark, sf_dir):
    from unified_vector_database_spark import tables
    from unified_vector_database_spark.functions import distance as D
    from unified_vector_database_spark.operators.index import opq_pq_knn
    from unified_vector_database_spark.operators.knn import knn
    from pyspark.sql import functions as F

    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", D.vec_double("embedding").alias("vec"))
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).first().embedding]
    qdf = spark.createDataFrame([(qvec,)], "qvec array<double>")
    flat = {r.vec_id for r in knn(corpus, qdf, k=10, metric="l2").collect()}
    got = opq_pq_knn(spark, sf_dir).collect()
    recall = len(flat & {r.vec_id for r in got}) / 10
    assert recall >= 0.7, f"OPQ-PQ recall@10 too low: {recall}"
    scores = [r.score for r in got]          # exact rerank => true L2 asc
    assert scores == sorted(scores)


def test_opq_rotation_decorrelates_subspace_variance(spark, sf_dir):
    """The point of OPQ: after rotation the per-dimension variance is
    sorted (eigenvalue order), so early PQ subspaces carry the most
    variance instead of whatever the raw storage order gave."""
    import numpy as np

    from unified_vector_database_spark.operators.index import (
        _opq_artifacts, KMEANS_SAMPLE,
    )
    import duckdb

    mu, r, cbs, _ = _opq_artifacts(sf_dir)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id LIMIT {KMEANS_SAMPLE}").fetchall()
    con.close()
    x = np.array([v[0] for v in rows], dtype=np.float64)
    y = (x - np.asarray(mu)) @ np.asarray(r).T
    var = y.var(axis=0)
    assert (np.diff(var) <= 1e-9).all(), "rotated dims not variance-sorted"
    # and the rotated covariance is (near-)diagonal
    cov = np.cov(y.T)
    off = np.abs(cov - np.diag(np.diag(cov))).max()
    assert off < np.diag(cov).max() * 1e-6


def test_opq_probe_reads_codes_artifact_not_vectors(spark, sf_dir):
    from unified_vector_database_spark.operators.index import (
        _opq_artifacts, opq_codes_artifact, pq_adc_scores, _rotate_col,
    )
    from unified_vector_database_spark import tables
    from unified_vector_database_spark.functions import distance as D
    from pyspark.sql import functions as F

    mu, r, cbs, qvec = _opq_artifacts(sf_dir)
    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", D.vec_double("embedding").alias("vec"))
    rotated = corpus.select(
        "vec_id", _rotate_col(F.col("vec"), mu, r).alias("vec"))
    codes = opq_codes_artifact(spark, sf_dir, rotated, cbs)
    plan = _plan(pq_adc_scores(codes, qvec, cbs)
                 .orderBy("adc", "vec_id").limit(64))
    # the ADC shortlist pass scans the codes artifact, not embeddings
    assert "opq_codes" in plan
    assert "embeddings.parquet" not in plan


# ------------------------------------------------------ search_mvt_tile
