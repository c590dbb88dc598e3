"""Batch HNSW: build parity with the numpy twin, probe recall vs the
exact FLAT baseline, the no-collect parquet-adjacency probe path, and
degenerate-corpus behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.functions import distance as D
from unified_vector_database_spark.operators import hnsw
from unified_vector_database_spark.operators.knn import knn


def _corpus(spark, sf_dir):
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")
    return emb.select("vec_id", D.vec_double("embedding").alias("vec"))


def _query(spark, sf_dir, vid=0):
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")
    return (emb.where(F.col("vec_id") == vid)
               .select(D.vec_double("embedding").alias("qvec")))


def test_build_matches_numpy_twin(spark, sf_dir):
    """The distributed build and the Spark-free oracle twin must agree
    bit-for-bit — that equality is what makes the embedded-adjacency
    DuckDB oracle a real hash gate rather than a self-check."""
    art = hnsw.art_for(spark, sf_dir, _corpus(spark, sf_dir))
    twin = hnsw._twin_build(sf_dir)
    assert art["L"] == twin["L"]
    assert art["tops"] == twin["tops"]
    assert set(art["adj"]) == set(twin["adj"])
    for lvl in art["adj"]:
        assert art["adj"][lvl] == twin["adj"][lvl], f"layer {lvl} diverged"


def test_probe_recall_vs_flat(spark, sf_dir):
    """Mean recall@10 against the exact FLAT scan over several query
    points. The synthetic embeddings are near-random (same-label mean
    cosine 0.019) — the hardest case for graph ANN — and the tuned
    build/probe still measured ~0.98 mean recall; gate at 0.8."""
    corpus = _corpus(spark, sf_dir)
    art = hnsw.art_for(spark, sf_dir, corpus)
    hits, total = 0, 0
    for vid in (0, 101, 202, 303, 404):
        q = _query(spark, sf_dir, vid)
        approx = {r.vec_id for r in
                  hnsw.hnsw_probe(spark, corpus, art, q, k=10).collect()}
        exact = {r.vec_id for r in knn(corpus, q, k=10).collect()}
        hits += len(approx & exact)
        total += 10
    assert hits / total >= 0.8, f"recall {hits / total}"


def test_self_match_is_top1(spark, sf_dir):
    """A corpus vector queried against the index must surface itself
    first with cosine exactly 1.0 — the beam reaching the query's own
    graph neighborhood is the navigability smoke test."""
    corpus = _corpus(spark, sf_dir)
    art = hnsw.art_for(spark, sf_dir, corpus)
    rows = hnsw.hnsw_probe(spark, corpus, art,
                           _query(spark, sf_dir, 0), k=10).collect()
    assert rows[0].vec_id == 0
    assert rows[0].score == pytest.approx(1.0)


def test_probe_from_parquet_adjacency(spark, sf_dir, tmp_path):
    """The 100 TB probe path: adjacency read back from a parquet
    artifact (edges never collected to the driver) must reproduce the
    in-memory probe exactly."""
    corpus = _corpus(spark, sf_dir)
    art = hnsw.art_for(spark, sf_dir, corpus)
    path = str(tmp_path / "hnsw_adj0")
    hnsw._adj_df(spark, art["adj"][0]).write.parquet(path)
    art_pq = {"L": art["L"], "tops": art["tops"],
              "adj": {**art["adj"], 0: spark.read.parquet(path)}}
    q = _query(spark, sf_dir, 7)
    mem = [(r.vec_id, r.score) for r in
           hnsw.hnsw_probe(spark, corpus, art, q, k=10).collect()]
    pq = [(r.vec_id, r.score) for r in
          hnsw.hnsw_probe(spark, corpus, art_pq, q, k=10).collect()]
    assert mem == pq


def test_driver_beam_equals_distributed_probe(spark, sf_dir):
    """The registered single-query path (driver-side beam, bounded
    isin-pruned scoring jobs) must reproduce the distributed
    frontier-join probe exactly — same hops, tie-breaks, scores."""
    corpus = _corpus(spark, sf_dir)
    art = hnsw.art_for(spark, sf_dir, corpus)
    for vid in (0, 33):
        q = _query(spark, sf_dir, vid)
        qvec = [float(v) for v in
                corpus.where(F.col("vec_id") == vid).first().vec]
        dist = [(r.vec_id, r.score) for r in
                hnsw.hnsw_probe(spark, corpus, art, q, k=10).collect()]
        drv = [(r.vec_id, r.score) for r in
               hnsw.hnsw_probe_driver(spark, corpus, art, qvec,
                                      k=10).collect()]
        assert dist == drv


def test_degenerate_tiny_corpus(spark):
    """3-node corpus: level>=1 layer is (almost surely) empty, so the
    top layer falls back to every node and the probe degrades to an
    exact scan — no crash, full result."""
    rows = [(i, [float(i + 1), 1.0, 0.0, 0.5]) for i in range(3)]
    corpus = spark.createDataFrame(rows, "vec_id bigint, vec array<double>")
    art = hnsw.hnsw_build(spark, corpus)
    assert art["L"] == 1
    assert len(art["tops"]) >= 1
    q = spark.createDataFrame([([2.0, 1.0, 0.0, 0.5],)],
                              "qvec array<double>")
    got = hnsw.hnsw_probe(spark, corpus, art, q, k=10).collect()
    assert 1 <= len(got) <= 3
    assert got[0].score == max(r.score for r in got)


def test_oracle_sql_is_registered():
    from unified_vector_database_spark import registry
    registry.load_all()
    assert "hnsw_knn" in registry.QUERIES
    sql = registry.resolved_oracles()["hnsw_knn"]
    assert "adj0" in sql and "LIMIT 10" in sql
