"""Bucketed-layout scale property (SURVEY §6): two tables bucketed on
the join key join WITHOUT an exchange — the plan contract that makes
recurring id-joins partition-local at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.plans.asserts import plan_text
from unified_vector_database_spark.sources.io import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    scores = emb.select("vec_id", (F.col("vec_id") % 7).alias("score"))
    write_bucketed(emb, "emb_bkt", "vec_id", num_buckets=8)
    write_bucketed(scores, "scores_bkt", "vec_id", num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # model the 100 TB case: neither side broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (read_table(spark, "emb_bkt")
                  .join(read_table(spark, "scores_bkt"), "vec_id")
                  .select("vec_id", "label", "score"))
        text = plan_text(joined)
        assert "Exchange" not in text, text        # bucket-local join
        assert "SelectedBucketsCount" in text or "Bucketed: true" in text, text
        assert joined.count() == emb.count()

        # groupBy on the bucket key also reuses the layout: no exchange
        agg = (read_table(spark, "emb_bkt")
               .groupBy("vec_id").agg(F.count("*").alias("n")))
        assert "Exchange" not in plan_text(agg), plan_text(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS emb_bkt")
        spark.sql("DROP TABLE IF EXISTS scores_bkt")
