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


@register("mmr_rerank")  # rows-only: greedy selection is not SQL
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 cosine candidates for query vec_id=0, MMR-reranked to a
    diverse top-10 (lambda=0.5)."""
    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", D.vec_double("embedding").alias("vec"))
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow.embedding]
    qdf = spark.createDataFrame([Row(qvec=qvec)])
    from .knn import knn
    cand_ids = [r.vec_id for r in
                knn(corpus, qdf, k=30, metric="cosine").collect()]
    cand = corpus.where(F.col("vec_id").isin(cand_ids))
    picks = mmr_rerank(cand, qvec, k=10)
    return spark.createDataFrame(
        [Row(rank=i + 1, vec_id=int(v), mmr_score=round(float(s), 6))
         for i, (v, s) in enumerate(picks)])
