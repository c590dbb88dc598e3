"""Inverted-index layout: term-bucket partition pruning at the file
listing; impact-ordered pruning degrades gracefully to exact BM25."""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.operators.hybrid import (
    QUERY_TERMS, bm25_search,
)
from unified_vector_database_spark.operators.inverted import (
    bm25_pruned_search, build_posting_lists, read_postings,
    write_inverted_index,
)
from unified_vector_database_spark.plans.asserts import plan_text


def test_posting_index_prunes_buckets(spark, sf_dir, tmp_path):
    docs = tables.load(spark, sf_dir, "documents")
    postings = build_posting_lists(docs)
    path = str(tmp_path / "inv")
    write_inverted_index(postings, path)

    got = read_postings(spark, path, QUERY_TERMS)
    text = plan_text(got)
    assert "PartitionFilters" in text and "bucket" in text
    # postings round-trip: same tf for a spot-checked term
    want = {(r.doc_id, r.tf) for r in
            postings.where(F.col("term") == QUERY_TERMS[0]).collect()}
    have = {(r.doc_id, r.tf) for r in
            got.where(F.col("term") == QUERY_TERMS[0]).collect()}
    assert want == have and want


def test_postings_denormalized_dl(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    p = build_posting_lists(docs)
    bad = p.groupBy("doc_id").agg(
        F.countDistinct("dl").alias("ndl")).where(F.col("ndl") != 1)
    assert bad.count() == 0


def test_pruned_bm25_equals_exact_when_uncut(spark, sf_dir):
    exact = [(r.doc_id, r.score) for r in bm25_search(spark, sf_dir).collect()]
    uncut = [(r.doc_id, r.score) for r in
             bm25_pruned_search(spark, sf_dir, impact_n=10 ** 9).collect()]
    assert exact == uncut


def test_pruned_bm25_recall(spark, sf_dir):
    exact = {r.doc_id for r in bm25_search(spark, sf_dir).collect()}
    pruned = {r.doc_id for r in bm25_pruned_search(spark, sf_dir).collect()}
    assert len(exact & pruned) / len(exact) >= 0.8
