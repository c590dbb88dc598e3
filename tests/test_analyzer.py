"""Analyzer chain: three-way rule parity (Python twin / Spark expr /
DuckDB expr), the stem+synonym hits whitespace tokenization misses,
and the registered analyzed-match query."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from unified_vector_database_spark.functions import text as T
from unified_vector_database_spark.operators.analyzer import (
    ANALYZED_QUERY, analyzed_bm25, analyzed_match_search)
from unified_vector_database_spark.operators.hybrid import bm25_scores

SAMPLES = [
    "The quick merging joins for big tables",
    "classes queries buses kiss us it IS The",
    "Merged edited ending sorting s ss ees e tree trees",
    "rapid large largest a an and or of to in on",
    "  spaced   out   tokens  ",
    "",
    "merge merges merging merged MERGE",
    "\tfast merge\n",   # tabs/newlines: trim() is spaces-only in SQL
    " fast\tmerge ",    # embedded tab must survive both engines alike
]


def test_analyzer_three_way_parity(spark):
    """The Spark expression, the DuckDB expression, and the Python
    twin must agree token-for-token — that equality is what makes the
    analyzed oracle a real hash gate."""
    py = [T.analyze_py(s) for s in SAMPLES]
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)],
                                "i int, text string")
    got_spark = {r.i: list(r.a) for r in
                 sdf.select("i", T.analyzed_tokens("text").alias("a"))
                 .collect()}
    assert [got_spark[i] for i in range(len(SAMPLES))] == py
    con = duckdb.connect()
    expr = T.analyzed_tokens_sql("text", "duck")
    for i, s in enumerate(SAMPLES):
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS text)", [s]).fetchone()[0]
        assert list(got) == py[i], f"duck diverged on {s!r}"
    con.close()


def test_stem_consistency_on_inflection_families():
    """Every inflection family must land on ONE stem — the property
    that makes query-side and corpus-side analysis meet."""
    fams = [("merge", "merges", "merging", "merged"),
            ("join", "joins", "joining", "joined"),
            ("table", "tables"), ("query", "queries"),
            ("class", "classes"), ("sort", "sorts", "sorted",
                                   "sorting")]
    for fam in fams:
        stems = {T.analyze_py(w)[0] for w in fam}
        assert len(stems) == 1, f"{fam} -> {stems}"


def test_analyzed_hits_where_whitespace_misses(spark, sf_dir):
    """The pin the round-9 brief asks for: the surface query's terms
    match NOTHING under whitespace tokenization (the corpus vocabulary
    holds only base stems), while the analyzed match scores plenty."""
    surface = ("quick", "merging", "joins", "tables")
    assert all(t in ANALYZED_QUERY.lower().split(" ") for t in surface)
    raw = bm25_scores(spark, sf_dir, terms=surface)
    assert raw.count() == 0, "surface inflections should miss"
    got = analyzed_match_search(spark, sf_dir).collect()
    assert len(got) == 15
    assert all(got[i].score >= got[i + 1].score for i in range(14))


def test_corpus_side_stemming_and_synonyms(spark):
    """Corpus-side analysis: documents containing ONLY inflected /
    synonym forms must be found by a base-stem query."""
    docs = spark.createDataFrame(
        [(1, "merging the tables quickly"),
         (2, "rapid joins and QUICK sorts"),
         (3, "nothing relevant here")],
        "doc_id bigint, text string")
    got = {r.doc_id for r in
           analyzed_bm25(docs, "merge fast join").collect()}
    assert got == {1, 2}
    # and the scored terms really are the analyzed forms
    atoks = {r.doc_id: list(r.a) for r in
             docs.select("doc_id",
                         T.analyzed_tokens("text").alias("a")).collect()}
    assert "merg" in atoks[1] and "fast" in atoks[2]


def test_dl_counts_post_analysis_tokens(spark):
    """Doc length must be the POST-analysis token count (Lucene's
    indexed-field length): stopwords must not inflate dl."""
    docs = spark.createDataFrame(
        [(1, "the a an merge"), (2, "merge")],
        "doc_id bigint, text string")
    scores = {r.doc_id: r.score for r in
              analyzed_bm25(docs, "merge").collect()}
    assert scores[1] == pytest.approx(scores[2]), \
        "stopwords changed dl — analysis not applied to length"


def test_empty_analyzed_query_refused(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="zero terms"):
        analyzed_bm25(docs, "the a an")


def test_phrase_occurrences_both_engines(spark):
    """Position semantics pinned on a synthetic frame: inflected
    surface forms AND stopword-gap closing both produce phrase hits;
    occurrence counts agree between Spark and DuckDB."""
    from unified_vector_database_spark.operators.analyzer import \
        _phrase_occ_sql
    rows = [(1, "a quick merge here"),          # synonym+stem bigram
            (2, "fast the merge"),              # stopword gap closes
            (3, "fast sort merge"),             # non-contiguous: miss
            (4, "quick merges quick merges"),   # two occurrences
            (5, "merge fast"),                  # wrong order: miss
            (6, "")]
    terms = T.analyze_py("quick merges")
    assert terms == ["fast", "merg"]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    an = docs.select("doc_id", T.analyzed_tokens("text").alias("a"))
    got = {r.doc_id: r.n for r in
           an.select("doc_id", F.expr(
               _phrase_occ_sql("a", terms, "spark")).alias("n"))
           .collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 2, 5: 0, 6: 0}
    con = duckdb.connect()
    atok = T.analyzed_tokens_sql("text", "duck")
    occ = _phrase_occ_sql("a", terms, "duck")
    for doc_id, text in rows:
        n = con.execute(
            f"SELECT {occ} FROM (SELECT {atok} AS a FROM "
            "(SELECT ? AS text))", [text]).fetchone()[0]
        assert n == got[doc_id], f"duck diverged on doc {doc_id}"
    con.close()


def test_phrase_registered_nonempty(spark, sf_dir):
    from unified_vector_database_spark.operators.analyzer import \
        analyzed_phrase_search
    rows = analyzed_phrase_search(spark, sf_dir).collect()
    assert rows and all(r.n_occ >= 1 for r in rows)
    assert all(rows[i].n_occ >= rows[i + 1].n_occ
               for i in range(len(rows) - 1))


def test_oracle_registered():
    from unified_vector_database_spark import registry
    registry.load_all()
    assert "analyzed_match_search" in registry.QUERIES
    sql = registry.resolved_oracles()["analyzed_match_search"]
    assert "list_transform" in sql and "LIMIT 15" in sql
