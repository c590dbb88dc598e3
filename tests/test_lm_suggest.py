"""Semantic invariants for the bigram-LM quality scorer and the
suggester/highlight family (parity itself is covered by
test_oracle_parity's parametrized sweep)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from unified_vector_database_spark.operators.lm import doc_bigrams
from unified_vector_database_spark.operators.suggest import (
    search_highlight, suggest_prefix,
)


def test_bigram_count_is_tokens_minus_one(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b c d"),
        Row(doc_id=1, text="  x  y  "),   # whitespace noise -> 2 tokens
        Row(doc_id=2, text="solo"),       # 1 token -> no bigrams
    ])
    n = {r.doc_id: r.n for r in
         doc_bigrams(docs).groupBy("doc_id").agg(F.count("*").alias("n"))
         .collect()}
    assert n == {0: 3, 1: 1}


def test_bigrams_preserve_multiplicity(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="a b a b a")])
    rows = [(r.w1, r.w2) for r in doc_bigrams(docs).collect()]
    assert sorted(rows) == [("a", "b"), ("a", "b"), ("b", "a"), ("b", "a")]


def test_suggestions_all_match_prefix(spark, sf_dir):
    for r in suggest_prefix(spark, sf_dir).collect():
        assert r.suggestion.startswith("s")
        assert r.freq >= r.n_docs >= 1


def test_highlight_snippet_contains_term(spark, sf_dir):
    rows = search_highlight(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert "vector" in r.snippet
        assert r.hit_pos >= 1
