"""CSV / JSON-lines round-trips (SURVEY §2.10 S2), vector-aware."""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.sources.io import (
    read_csv, read_jsonl, write_csv, write_jsonl,
)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    emb = tables.load(spark, sf_dir, "embeddings").limit(100)
    path = str(tmp_path / "emb_jsonl")
    write_jsonl(emb, path)
    back = read_jsonl(spark, path,
                      "vec_id long, embedding array<float>, label int")
    assert back.count() == 100
    a = {r.vec_id: (list(r.embedding), r.label) for r in emb.collect()}
    b = {r.vec_id: (list(r.embedding), r.label) for r in back.collect()}
    assert a == b


def test_csv_roundtrip_with_vectors(spark, sf_dir, tmp_path):
    emb = tables.load(spark, sf_dir, "embeddings").limit(50)
    path = str(tmp_path / "emb_csv")
    write_csv(emb, path, vector_cols=("embedding",))
    back = read_csv(spark, path,
                    "vec_id long, label int, embedding_json string",
                    vector_cols=("embedding",))
    a = {r.vec_id: (list(r.embedding), r.label) for r in emb.collect()}
    b = {r.vec_id: (list(r.embedding), r.label) for r in back.collect()}
    assert a == b


def test_csv_plain(spark, sf_dir, tmp_path):
    docs = tables.load(spark, sf_dir, "documents").limit(20)
    path = str(tmp_path / "docs_csv")
    write_csv(docs, path)
    back = read_csv(spark, path,
                    "doc_id long, text string, lang string, source string, n_chars long")
    assert back.count() == 20
    assert {r.doc_id for r in back.collect()} == {r.doc_id for r in docs.collect()}


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from unified_vector_database_spark.sources.io import read_orc, write_orc
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "docs_orc")
    write_orc(docs, p)
    back = read_orc(spark, p)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    # checksum parity: same rows, not just same count
    a = docs.agg(F.sum(F.col("doc_id") * F.col("n_chars"))).first()[0]
    b = back.agg(F.sum(F.col("doc_id") * F.col("n_chars"))).first()[0]
    assert a == b
    # predicate reaches the ORC scan (stripe pushdown)
    plan = back.where(F.col("doc_id") == 7)._jdf.queryExecution() \
               .executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]" in plan


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    from unified_vector_database_spark.sources.io import read_evolved
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g1 = str(tmp_path / "gen1")
    g2 = str(tmp_path / "gen2")
    docs.where("doc_id < 100").write.parquet(g1)
    # generation 2 adds a payload column older files never had
    (docs.where("doc_id >= 100")
         .withColumn("toxicity", (F.col("doc_id") % 7) / 10.0)
         .write.parquet(g2))
    merged = read_evolved(spark, g1, g2)
    assert "toxicity" in merged.columns
    n1 = docs.where("doc_id < 100").count()
    # old generation null-fills the new column
    assert merged.where(F.col("toxicity").isNull()).count() == n1
    assert merged.count() == docs.count()
    # filters on pre-existing columns still push into BOTH generations
    plan = merged.where(F.col("doc_id") == 3)._jdf.queryExecution() \
                 .executedPlan().toString()
    assert "EqualTo(doc_id,3)" in plan
