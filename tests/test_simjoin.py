"""Similarity self-join recall/precision vs brute force, and the
Arrow knn fast path vs the exact JVM scorer."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row, functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.functions import distance as D
from unified_vector_database_spark.operators.arrow_knn import knn_arrow
from unified_vector_database_spark.operators.knn import knn
from unified_vector_database_spark.operators.simjoin import similarity_join


def _noisy_corpus(spark, n_groups=20, dim=16, eps=0.02):
    """Groups of 3 near-identical vectors (true near-dup pairs) plus
    singletons; deterministic."""
    rng = random.Random(7)
    rows = []
    vid = 0
    for g in range(n_groups):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        for _ in range(3):
            v = [x + rng.gauss(0, eps) for x in base]
            rows.append(Row(vec_id=vid, vec=[float(x) for x in v]))
            vid += 1
    for _ in range(40):
        rows.append(Row(vec_id=vid,
                        vec=[float(rng.gauss(0, 1)) for _ in range(dim)]))
        vid += 1
    return spark.createDataFrame(rows)


def _brute_pairs(rows, tau):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if cos(rows[i].vec, rows[j].vec) >= tau:
                out.add((rows[i].vec_id, rows[j].vec_id))
    return out


def test_similarity_join_recall_precision(spark):
    corpus = _noisy_corpus(spark)
    rows = sorted(corpus.collect(), key=lambda r: r.vec_id)
    truth = _brute_pairs(rows, tau=0.95)
    assert len(truth) >= 50  # the synthetic near-dup groups
    got = {(r.id_a, r.id_b)
           for r in similarity_join(corpus, threshold=0.95, dim=16).collect()}
    # precision is exact by construction (verify stage); recall bounded
    assert got <= truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"similarity_join recall too low: {recall}"


def test_arrow_knn_matches_jvm(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = (emb.select("vec_id", D.vec_double("embedding").alias("vec"))
                 .withColumn("nvec", D.norm("vec")))
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).first().embedding]
    qdf = (emb.where(F.col("vec_id") == 0)
              .select(D.vec_double("embedding").alias("qvec"))
              .withColumn("nq", D.norm("qvec")))
    exact = knn(corpus, qdf, k=10, metric="cosine")
    fast = knn_arrow(corpus, qvec, k=10)
    e = [(r.vec_id, r.score) for r in exact.collect()]
    f = [(r.vec_id, r.score) for r in fast.collect()]
    assert [x[0] for x in e] == [x[0] for x in f]
    for (ei, es), (fi, fs) in zip(e, f):
        assert abs(es - fs) < 1e-9
