"""D12 size-switch (VERDICT r6 #5): eval sets past the broadcast
limit route through the hyperplane-LSH banded join instead of the
BroadcastNestedLoopJoin. These tests force the switch on small data
and pin the banded path's output against the exact path.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.functions import distance as D
from unified_vector_database_spark.operators.cleanup import (
    EMB_DECON_TAU, _hyperplane_bands, decontaminate_embeddings,
)

SF_DIR = "/root/testdata/sf0.001"


def _sides(spark):
    emb = tables.load_parallel(spark, SF_DIR, "embeddings", "vec_id")
    vecs = emb.select("vec_id", D.vec_double("embedding").alias("vec"))
    is_bench = (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 12_500)
    bench = (vecs.where(is_bench)
                 .select(F.col("vec_id").alias("bid"),
                         F.col("vec").alias("bvec"),
                         D.norm("vec").alias("bnrm")))
    train = (vecs.where(~is_bench)
                 .select("vec_id", "vec", D.norm("vec").alias("nrm")))
    return train, bench


def test_hyperplane_bands_hit_recall_budget():
    for tau in (0.33, 0.6, 0.9):
        b, r = _hyperplane_bands(tau, target_recall=0.98)
        p = 1.0 - math.acos(tau) / math.pi
        recall = 1.0 - (1.0 - p ** r) ** b
        assert recall >= 0.98
        assert b * r <= 60  # one bigint signature


def test_switch_engages_and_matches_exact_page(spark):
    """Forcing broadcast_limit=0 routes through the banded join; on
    the sf0.001 corpus the page must equal the exact path's page
    cell-for-cell (recall at the page's similarity levels is ~1 for
    the tau-tuned banding) and every admitted pair must score
    bit-identically (same hoisted-norm kernel)."""
    train, bench = _sides(spark)
    exact = decontaminate_embeddings(
        train, bench, EMB_DECON_TAU, eval_rows=10**9,
        broadcast_limit=10**9).collect()
    banded = decontaminate_embeddings(
        train, bench, EMB_DECON_TAU, eval_rows=10**9,
        broadcast_limit=0).collect()
    assert [tuple(r) for r in banded] == [tuple(r) for r in exact]


def test_small_eval_stays_on_broadcast_plan(spark):
    """Default limit keeps a 500-row eval set on the broadcast BNLJ
    plan — the banded path's extra shuffle never appears."""
    train, bench = _sides(spark)
    plan = decontaminate_embeddings(
        train, bench, EMB_DECON_TAU,
        eval_rows=500)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
