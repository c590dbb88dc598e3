"""Reranking (SURVEY §2.2 V9): MMR (maximal marginal relevance) — the
diversity rerank Chroma/LangChain expose as `max_marginal_relevance`.

MMR is inherently sequential-greedy over a SMALL candidate list (the
top-N of a knn, N <= ~1000), so the idiomatic Spark split is:
distributed candidate generation (knn), then a driver-side greedy
pass over the collected N rows — the one sanctioned .collect() in
this engine (documented in SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from .. import tables
from ..functions import distance as D
from ..registry import register


def _cos(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return dot / (na * nb) if na and nb else 0.0


def mmr_rerank(candidates: DataFrame, query_vec: list[float],
               k: int, lam: float = 0.5, id_col: str = "vec_id",
               vec_col: str = "vec") -> list[tuple[int, float]]:
    """Greedy MMR over a collected candidate set: argmax of
    lam*sim(q,d) - (1-lam)*max_{s in selected} sim(d,s).
    Returns [(id, mmr_score), ...] in selection order."""
    rows = candidates.select(id_col, vec_col).collect()
    vecs = {r[0]: list(r[1]) for r in rows}
    rel = {i: _cos(v, query_vec) for i, v in vecs.items()}
    selected: list[tuple[int, float]] = []
    remaining = sorted(vecs)
    while remaining and len(selected) < k:
        best, best_score = None, None
        for i in remaining:
            div = max((_cos(vecs[i], vecs[s]) for s, _ in selected),
                      default=0.0)
            score = lam * rel[i] - (1 - lam) * div
            if best_score is None or score > best_score:
                best, best_score = i, score
        selected.append((best, best_score))
        remaining.remove(best)
    return selected


_MMR_LAM = 0.7
_COS = ("list_dot_product({a}, {b})"
        "/(sqrt(list_dot_product({a}, {a}))*sqrt(list_dot_product({b}, {b})))")


@register("mmr_rerank", oracle=f"""
WITH RECURSIVE
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {_COS.format(a="embedding::DOUBLE[]", b="qv")} AS rel
  FROM embeddings, q
  ORDER BY rel DESC, vec_id LIMIT 30),
sel AS (
  (SELECT 1 AS rank, vec_id, {_MMR_LAM} * rel AS mmr_score,
          [vec_id] AS chosen
   FROM cand ORDER BY {_MMR_LAM} * rel DESC, vec_id LIMIT 1)
  UNION ALL
  SELECT s.rank + 1, x.vec_id, x.score, list_append(s.chosen, x.vec_id)
  FROM sel s, LATERAL (
    SELECT c.vec_id,
           {_MMR_LAM} * c.rel - {1 - _MMR_LAM} * (
             SELECT max({_COS.format(a="c.v", b="c2.v")})
             FROM cand c2 WHERE list_contains(s.chosen, c2.vec_id)) AS score
    FROM cand c WHERE NOT list_contains(s.chosen, c.vec_id)
    ORDER BY score DESC, c.vec_id LIMIT 1) x
  WHERE s.rank < 10)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, round(mmr_score, 6) AS mmr_score
FROM sel ORDER BY rank
""")
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 cosine candidates for query vec_id=0, MMR-reranked to a
    diverse top-10 (lambda=0.7 — every pick's score is discriminative,
    not a tie cascade).

    The oracle expresses the SAME greedy recurrence as a DuckDB
    recursive CTE with a LATERAL argmax per step (list state carries
    the chosen set), so the driver hash checks the full selection
    order and scores — the sequential-greedy op is SQL-expressible
    after all. Arithmetic matches because Python's sequential
    sum/sqrt cosine is bit-identical to list_dot_product (see
    functions/distance.py)."""
    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", D.vec_double("embedding").alias("vec"))
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow.embedding]
    qdf = spark.createDataFrame([Row(qvec=qvec)])
    from .knn import knn
    cand_ids = [r.vec_id for r in
                knn(corpus, qdf, k=30, metric="cosine").collect()]
    cand = corpus.where(F.col("vec_id").isin(cand_ids))
    picks = mmr_rerank(cand, qvec, k=10, lam=_MMR_LAM)
    return spark.createDataFrame(
        [Row(rank=i + 1, vec_id=int(v), mmr_score=round(float(s), 6))
         for i, (v, s) in enumerate(picks)])
