"""Round-6 build checks: registry invariants plus independent-model
tests for the r6-built operators (weighted-percentile sketch, nested
/children aggregations, sampler, moving_fn models).
"""

from __future__ import annotations

import pytest


def test_registry_names_are_unique():
    # VERDICT r5 #1: a silent duplicate registration left a dead
    # shadowed body behind. register() must now refuse duplicates, so
    # that load_all() importing cleanly IS the uniqueness proof.
    from unified_vector_database_spark import registry

    registry.load_all()
    assert len(registry.QUERIES) >= 270

    with pytest.raises(ValueError, match="duplicate query registration"):
        registry.register("knn_cosine")(lambda spark, sf_dir: None)
    # the failed re-registration must not have clobbered the original
    assert registry.QUERIES["knn_cosine"] is not None


def test_weighted_median_sketch_within_one_bin_of_exact(spark, sf_dir):
    # The sketch's covering bin contains the exact weighted median,
    # so |estimate - exact| <= one bin width by construction — the
    # error contract that lets it replace the exact sort at scale.
    from unified_vector_database_spark import tables
    from unified_vector_database_spark.operators.stats_more import (
        WM_BINS, weighted_median_price, weighted_median_sketch,
    )
    import pyspark.sql.functions as F

    exact = {r.l_returnflag: float(r.weighted_median)
             for r in weighted_median_price(spark, sf_dir).collect()}
    est_rows = weighted_median_sketch(spark, sf_dir).collect()
    est = {r.l_returnflag: r.weighted_median_est for r in est_rows}
    tw = {r.l_returnflag: r.total_weight for r in est_rows}

    li = tables.load(spark, sf_dir, "lineitem")
    [b] = li.agg(F.min("l_extendedprice").cast("double").alias("lo"),
                 F.max("l_extendedprice").cast("double").alias("hi")) \
            .collect()
    width = (b.hi - b.lo) / WM_BINS

    assert set(est) == set(exact) and len(est) == 3
    for flag, ex in exact.items():
        assert abs(est[flag] - ex) <= width + 1e-9, (flag, est[flag], ex)
        assert tw[flag] > 0
