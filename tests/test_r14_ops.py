"""Round-6 r14-wave checks: ES|QL MV_EXPAND/SPLIT/LOOKUP extensions,
Qdrant formula rescoring, batched rank_eval, span-corruption masking,
and reindex-with-script — independent re-derivations and plan shape.
"""

from __future__ import annotations

import collections
import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------- ES|QL extensions

def test_split_delimiter_is_literal_not_regex(spark):
    from unified_vector_database_spark.operators.esql import (
        _parse_expr, _tokenize,
    )

    df = spark.createDataFrame([("a.b.c",)], "s string")
    out = df.select(
        _parse_expr(_tokenize('SPLIT(s, ".")')).alias("v")).first().v
    assert out == ["a", "b", "c"]  # "." must not match-any


def test_mv_expand_census_matches_direct(spark, sf_dir):
    from unified_vector_database_spark import tables
    from unified_vector_database_spark.operators.esql import (
        esql_mv_expand,
    )
    from unified_vector_database_spark.functions.text import tokens

    want = (tables.load(spark, sf_dir, "documents")
            .select("doc_id", F.explode(tokens("text")).alias("token"))
            .groupBy("token")
            .agg(F.countDistinct("doc_id").cast("long").alias("df"),
                 F.count("*").alias("n"))
            .orderBy(F.desc("df"), "token").limit(15).collect())
    got = esql_mv_expand(spark, sf_dir).collect()
    assert [(r.token, r.df, r.n) for r in got] == \
        [(r.token, r.df, r.n) for r in want]


def test_lookup_join_broadcasts(spark, sf_dir):
    from unified_vector_database_spark.operators.esql import (
        ESQL_LOOKUP, esql,
    )

    plan = _plan(esql(spark, sf_dir, ESQL_LOOKUP))
    assert "BroadcastHashJoin" in plan, plan


# -------------------------------------------------- formula_rescore

def test_formula_combines_prefetch_and_decay(spark, duck, sf_dir):
    from unified_vector_database_spark.operators.knn import (
        FORMULA_ORIGIN, FORMULA_PREFETCH, FORMULA_SCALE, FORMULA_W,
        _LN2, formula_rescore,
    )

    rows = formula_rescore(spark, sf_dir).collect()
    assert len(rows) == 10
    chars = dict(duck.execute(
        "SELECT doc_id, n_chars FROM documents").fetchall())
    for r in rows:
        d = math.exp(-_LN2 * (abs(chars[r.vec_id] - FORMULA_ORIGIN)
                              / FORMULA_SCALE) ** 2)
        assert r.boost == pytest.approx(FORMULA_W * d, abs=2e-6)
        assert r.final_score == pytest.approx(
            r.prefetch_score + r.boost, abs=3e-6)
        assert 0.0 <= r.boost <= FORMULA_W
    scores = [r.final_score for r in rows]
    assert scores == sorted(scores, reverse=True)


# -------------------------------------------------- batch_rank_eval

def test_batch_eval_matches_per_query_python(spark, duck, sf_dir):
    import numpy as np

    from unified_vector_database_spark.operators.evaluation import (
        BATCH_EVAL_K, BATCH_EVAL_Q, batch_rank_eval,
    )

    rows = duck.execute(
        "SELECT vec_id, embedding, label FROM embeddings "
        "ORDER BY vec_id").fetchall()
    vecs = {r[0]: np.array(r[1], dtype=np.float64) for r in rows}
    labels = {r[0]: r[2] for r in rows}
    got = {r.qid: r for r in batch_rank_eval(spark, sf_dir).collect()}
    assert set(got) == set(range(BATCH_EVAL_Q))
    for qid in range(BATCH_EVAL_Q):
        qv = vecs[qid]
        scored = sorted(
            ((float(np.dot(v, qv)
                    / (np.linalg.norm(v) * np.linalg.norm(qv))), vid)
             for vid, v in vecs.items() if vid != qid),
            key=lambda t: (-t[0], t[1]))[:BATCH_EVAL_K]
        rel = [labels[vid] == labels[qid] for _, vid in scored]
        n_rel = sum(rel)
        mrr = next((1.0 / (i + 1) for i, x in enumerate(rel) if x), 0.0)
        r = got[qid]
        assert r.n_rel == n_rel
        assert r.p_at_k == pytest.approx(n_rel / BATCH_EVAL_K, abs=1e-9)
        assert r.mrr == pytest.approx(mrr, abs=2e-6)


# --------------------------------------------- span_corruption_census

def test_span_corruption_matches_hashlib(spark, duck, sf_dir):
    from unified_vector_database_spark.operators.cleanup import (
        SPAN_CORRUPT_A, SPAN_CORRUPT_B, SPAN_CORRUPT_CUT,
        SPAN_CORRUPT_LEN, SPAN_CORRUPT_P, span_corruption_census,
    )

    docs = duck.execute(
        "SELECT doc_id, lang, text FROM documents").fetchall()
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for doc_id, lang, text in docs:
        n = len([t for t in text.strip().split() if t])
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        masked = spans = 0
        for g in range((n + SPAN_CORRUPT_LEN - 1) // SPAN_CORRUPT_LEN):
            if (SPAN_CORRUPT_A * h + SPAN_CORRUPT_B * (g + 1)) \
                    % SPAN_CORRUPT_P < SPAN_CORRUPT_CUT:
                spans += 1
                masked += min(SPAN_CORRUPT_LEN, n - SPAN_CORRUPT_LEN * g)
        a = agg[lang]
        a[0] += 1
        a[1] += n
        a[2] += masked
        a[3] += spans
    got = span_corruption_census(spark, sf_dir).collect()
    for r in got:
        a = agg[r.lang]
        assert (r.n_docs, r.total_tokens, r.masked_tokens,
                r.n_spans) == tuple(a)
        # realized noise should be in the right regime for 15% target
        assert 0.03 < r.noise_ratio < 0.35


# ----------------------------------------------- reindex_transform

def test_reindex_copy_is_complete_and_transformed(spark, sf_dir):
    from unified_vector_database_spark import tables
    from unified_vector_database_spark.operators.lifecycle import (
        reindex_transform,
    )

    rows = reindex_transform(spark, sf_dir).collect()
    n_src = tables.load(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == n_src
    langs = {r.lang_up for r in rows}
    assert all(lu == lu.upper() for lu in langs)
    assert {r.wclass for r in rows} <= {"short", "long"}
