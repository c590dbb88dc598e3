"""Training-data cleanup operators: normalization, repetition
scoring, packing, and deterministic shuffle — invariants + edge cases
(empty / 1-token docs) + the no-global-window plan shape."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from unified_vector_database_spark import tables
from unified_vector_database_spark.operators import cleanup as cl
from unified_vector_database_spark.plans.asserts import plan_text


def _edge(spark):
    return spark.createDataFrame([
        Row(doc_id=0, source="s", text=""),
        Row(doc_id=1, source="s", text="one"),
        Row(doc_id=2, source="s", text="a a a a a a"),
        Row(doc_id=3, source="s", text="x y x y x y x y"),
    ])


def test_repetition_edge_cases(spark):
    rows = {r.doc_id: r for r in cl.repetition_score_t(_edge(spark)).collect()}
    assert len(rows) == 4
    assert rows[0].n_tokens == 0 and rows[0].dup_token_ratio == 0.0
    assert rows[1].dup_bigram_ratio == 0.0  # 1 token -> no bigrams
    assert rows[2].is_boilerplate  # 'a' * 6 -> dup ratio 5/6
    assert not rows[3].is_boilerplate


def test_clean_normalize_removes_stopwords_and_short(spark):
    rows = {r.doc_id: r for r in cl.clean_normalize_t(_edge(spark)).collect()}
    # "a a a a a a" -> everything removed (stopword + len<2)
    assert rows[2].n_removed == 6 and rows[2].clean_len == 0
    assert rows[0].n_tokens == 0


def test_pack_windows_sequential_and_budgeted(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    packed = cl.pack_context_windows_t(docs)
    rows = packed.orderBy("source", "doc_id").collect()
    # bins are non-decreasing within a source and every doc's window
    # start is exactly the cumulative estimate before it
    by_src: dict = {}
    for r in rows:
        prev_bin, cum = by_src.get(r.source, (0, 0))
        assert r.bin >= prev_bin
        assert r.cum_before == cum
        by_src[r.source] = (r.bin, cum + r.est_tokens)
    # a window never starts past the budget boundary of its bin
    assert all(r.cum_before // cl.PACK_BUDGET == r.bin for r in rows)


def test_pack_windows_partitioned_not_global(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    text = plan_text(cl.pack_context_windows_t(docs), mode="extended")
    # the cumulative window must key on source (shard-parallel), never
    # an empty partition spec
    assert "windowspecdefinition(source" in text, text


def test_corpus_shuffle_deterministic(spark, sf_dir):
    a = [r.doc_id for r in cl.corpus_shuffle(spark, sf_dir).collect()]
    b = [r.doc_id for r in cl.corpus_shuffle(spark, sf_dir).collect()]
    assert a == b and len(a) == 50
    # looks shuffled: not simply the lowest ids
    assert a != sorted(a)
