"""Property tests for the distance kernels: bounds, symmetry, and
metric identities on arbitrary vectors."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row, functions as F

from unified_vector_database_spark.functions import distance as D

FINITE = st.floats(min_value=-100, max_value=100,
                   allow_nan=False, allow_infinity=False)
VEC = st.lists(FINITE, min_size=2, max_size=8)


@settings(max_examples=15, deadline=None)
@given(st.tuples(VEC, VEC).filter(
    lambda t: len(t[0]) == len(t[1])
    and sum(x * x for x in t[0]) > 1e-6
    and sum(x * x for x in t[1]) > 1e-6))
def test_cosine_bounds_and_symmetry(spark, vecs):
    a, b = vecs
    df = spark.createDataFrame([Row(a=a, b=b)])
    r = df.select(D.cosine("a", "b").alias("ab"),
                  D.cosine("b", "a").alias("ba"),
                  D.cosine("a", "a").alias("aa"),
                  D.l2("a", "b").alias("l2ab"),
                  D.l2("b", "a").alias("l2ba"),
                  D.dot("a", "b").alias("dot")).first()
    assert -1.0 - 1e-9 <= r.ab <= 1.0 + 1e-9
    assert r.ab == r.ba                      # symmetric
    assert abs(r.aa - 1.0) < 1e-9            # self-similarity
    assert r.l2ab == r.l2ba and r.l2ab >= 0
    # dot identity: |a-b|^2 = |a|^2 + |b|^2 - 2<a,b>
    na2 = sum(x * x for x in a)
    nb2 = sum(x * x for x in b)
    assert abs(r.l2ab ** 2 - (na2 + nb2 - 2 * r.dot)) < 1e-6


@settings(max_examples=10, deadline=None)
@given(VEC.filter(lambda v: sum(x * x for x in v) > 1e-6))
def test_normalize_unit_norm(spark, v):
    df = spark.createDataFrame([Row(a=v)])
    r = df.select(D.norm(D.normalize("a")).alias("n")).first()
    assert abs(r.n - 1.0) < 1e-9
