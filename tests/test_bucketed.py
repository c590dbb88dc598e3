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


def test_zorder_layout_skips_files(spark, sf_dir, tmp_path):
    """Z-order clustering: after write_zorder on (label, vec_id), a
    point predicate on EITHER column must be satisfiable by a small
    fraction of files according to parquet footer min/max — the stats
    the scan uses to skip at file/row-group level."""
    import glob

    import pyarrow.parquet as pq

    from unified_vector_database_spark import tables
    from unified_vector_database_spark.sources.io import write_zorder

    emb = tables.load(spark, sf_dir, "embeddings") \
        .select("vec_id", "label")
    out = str(tmp_path / "zorder")
    write_zorder(emb, out, "label", "vec_id", num_files=8)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 4

    def minmax(f, col):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        return min(mins), max(maxs)

    n = emb.count()
    probe_label = 3
    probe_vec = emb.orderBy("vec_id").limit(1).collect()[0].vec_id + n // 2
    hit_label = sum(1 for f in files
                    if minmax(f, "label")[0] <= probe_label
                    <= minmax(f, "label")[1])
    hit_vec = sum(1 for f in files
                  if minmax(f, "vec_id")[0] <= probe_vec
                  <= minmax(f, "vec_id")[1])
    # both columns cluster: a point predicate on either hits under
    # half the files (a random or single-column-sorted layout leaves
    # the OTHER column spread across every file)
    assert hit_label <= len(files) // 2, (hit_label, len(files))
    assert hit_vec <= len(files) // 2, (hit_vec, len(files))
