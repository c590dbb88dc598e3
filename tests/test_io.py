"""CSV / JSON-lines round-trips (SURVEY §2.10 S2), vector-aware."""

from __future__ import annotations

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
