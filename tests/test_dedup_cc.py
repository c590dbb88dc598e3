"""Connected-components dedup clustering: label propagation finds the
exact components of the verified near-dup graph; the survivor policy
keeps exactly one member per cluster."""

from __future__ import annotations

from pyspark.sql import Row

from unified_vector_database_spark.operators.dedup import (
    connected_components, verified_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in pairs])


def test_cc_chain_and_islands(spark):
    # chain 1-2-3-4 plus island pair 10-11 plus triangle 20-21-22
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11),
                       (20, 21), (21, 22), (20, 22)])
    got = {r.id: r.label for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_cc_long_path_needs_doubling(spark):
    # a 12-node path exercises multiple propagation rounds
    e = _edges(spark, [(i, i + 1) for i in range(12)])
    got = {r.id: r.label for r in connected_components(e).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_verified_edges_transitive_cluster(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = spark.createDataFrame([
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base),                      # exact dup of 0
        Row(doc_id=2, text=base + " extra trailing"),  # near dup of 0/1
        Row(doc_id=3, text="one two three four five six seven eight "
                           "nine ten eleven twelve thirteen fourteen"),
    ])
    edges = verified_edges(docs)
    labels = {r.id: r.label for r in
              connected_components(edges).collect()}
    assert labels[0] == labels[1] == 0
    assert labels.get(2, 0) == 0          # near-dup joins the cluster
    assert 3 not in labels                # unrelated doc has no edges
