"""Sketch-family properties: mergeability (the distributed contract),
estimate accuracy bounds, and sampling determinism/mix fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.operators.sketches import (
    HLL_M, KMV_K, hll_estimate, hll_registers)
from unified_vector_database_spark.operators.sampling import (
    domain_mix_sample, hash_frac, quality_weighted_sample)


def test_hll_registers_merge(spark, sf_dir):
    """Registers built on disjoint halves merge by max() into exactly
    the global register table — the property that lets every executor
    sketch its partition independently."""
    ev = tables.load(spark, sf_dir, "events")
    full = hll_registers(ev, "event_type", "user_id")
    halves = [hll_registers(ev.where(F.col("event_id") % 2 == i),
                            "event_type", "user_id") for i in (0, 1)]
    merged = (halves[0].unionByName(halves[1])
              .groupBy("grp", "bucket").agg(F.max("m_j").alias("m_j")))
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_hll_estimate_accuracy(spark, sf_dir):
    """Raw HLL at m=256 has ~1.04/sqrt(m) = 6.5% std error; assert
    every group lands within 4 sigma of its exact count."""
    ev = tables.load(spark, sf_dir, "events")
    est = hll_estimate(hll_registers(ev, "event_type", "user_id"))
    exact = dict(ev.groupBy("event_type")
                   .agg(F.countDistinct("user_id")).collect())
    for grp, _s, e in est.collect():
        n = exact[grp]
        assert abs(e - n) / n < 4 * 1.04 / (HLL_M ** 0.5), (grp, e, n)


def test_kmv_estimate_accuracy(spark, sf_dir):
    """KMV relative error ~1/sqrt(k-2); assert within 4 sigma (or
    exact when the group has fewer than k distinct values)."""
    from unified_vector_database_spark.registry import QUERIES
    rows = QUERIES["distinct_kmv"](spark, sf_dir).collect()
    ev = tables.load(spark, sf_dir, "events")
    exact = dict(ev.groupBy("event_type")
                   .agg(F.countDistinct("user_id")).collect())
    for grp, size, e in rows:
        n = exact[grp]
        if size < KMV_K:
            assert e == n, (grp, e, n)
        else:
            assert abs(e - n) / n < 4 / ((KMV_K - 2) ** 0.5), (grp, e, n)


def test_quality_sample_is_deterministic_subset(spark, sf_dir):
    """Re-running yields the identical subset; admits follow the
    per-row coin exactly (no rng state anywhere)."""
    a = sorted(r[0] for r in quality_weighted_sample(spark, sf_dir).collect())
    b = sorted(r[0] for r in quality_weighted_sample(spark, sf_dir).collect())
    assert a == b and len(a) > 0


def test_domain_mix_hits_target_shares(spark, sf_dir):
    """Realized domain shares track the target mix: rates are ≤ 1 and
    the binding domain (rate == 1) keeps everything."""
    rows = domain_mix_sample(spark, sf_dir).collect()
    total = sum(r["n_sampled"] for r in rows)
    assert total > 0
    targets = {"en": 0.25, "de": 0.25, "zh": 0.20, "fr": 0.15, "es": 0.15}
    for r in rows:
        assert r["rate"] <= 1.0 + 1e-9
        # binomial tolerance: 5 sigma on n·p
        p = targets[r["lang"]]
        sigma = (total * p * (1 - p)) ** 0.5
        assert abs(r["n_sampled"] - total * p) < 5 * sigma + 3, r


def test_hash_frac_uniform(spark, sf_dir):
    """The admit coin is uniform enough to trust as a probability:
    mean of the fraction over the corpus within 5% of 0.5."""
    docs = tables.load(spark, sf_dir, "documents")
    m = docs.select(F.avg(hash_frac("doc_id")).alias("m")).collect()[0]["m"]
    assert 0.4 < m < 0.6
