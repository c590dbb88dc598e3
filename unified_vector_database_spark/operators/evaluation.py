"""Search quality evaluation — the ES `rank_eval` API surface
(precision@k / recall@k / nDCG@k over labeled relevance judgments;
implied by the `elasticsearch` client the reference installs,
/root/reference README.md:95). Every serving stack ships an eval
loop; at pipeline scale it runs as a batch job over (query, qrels)
tables.

Here the judgment set is derived deterministically from the corpus:
for query vec 0, a hit is relevant iff it carries the query's label —
the standard class-match protocol for synthetic eval. The operator
shape is the real thing: ranked results -> join qrels -> positional
gain math -> one metrics row.

Scale shape: the ranked list is bounded (top-k via TakeOrdered, ranks
via the window-free bounded-array shape); qrel counting is one
partial-agg'd aggregate over the corpus; the final metrics row is a
crossJoin of two 1-row aggregates. A thousand-query eval batch runs
the same plan with the query table broadcast (batch_knn's shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..functions import distance as D
from ..registry import register

EVAL_K = 10

_COS = ("list_dot_product(e.embedding::DOUBLE[], q.qvec)"
        "/(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
        "*sqrt(list_dot_product(q.qvec, q.qvec)))")


@register("search_quality_eval", oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec, label AS qlabel
           FROM embeddings WHERE vec_id = 0),
ranked AS (
  SELECT e.vec_id, e.label, q.qlabel,
         row_number() OVER (ORDER BY {_COS} DESC, e.vec_id) AS pos
  FROM embeddings e, q
  WHERE e.vec_id <> 0
  ORDER BY pos LIMIT {EVAL_K}),
rel AS (SELECT count(*) AS n_relevant
        FROM embeddings e, q
        WHERE e.vec_id <> 0 AND e.label = q.qlabel),
hits AS (
  SELECT count(*) AS n_hits,
         coalesce(sum(CASE WHEN label = qlabel
                           THEN 1.0 / log2(pos + 1) END), 0) AS dcg,
         count(*) FILTER (label = qlabel) AS n_rel_hits
  FROM ranked)
SELECT round(n_rel_hits * 1.0 / {EVAL_K}, 6) AS precision_at_k,
       round(n_rel_hits * 1.0
             / least(greatest(n_relevant, 1), {EVAL_K}), 6)
         AS recall_at_k,
       round(dcg / list_sum(list_transform(
             range(1, least(greatest(n_relevant, 1), {EVAL_K}) + 1),
             i -> 1.0 / log2(i + 1))), 6) AS ndcg_at_k,
       CAST(n_relevant AS BIGINT) AS n_relevant
FROM hits, rel
""")
def search_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank_eval for the cosine searcher on query vec 0: P@k, R@k
    (capped at k — the 'recall' ES rank_eval reports), and binary-gain
    nDCG@k with the ideal DCG from the true relevant count, k=10."""
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")
    q = (emb.where(F.col("vec_id") == 0)
            .select(D.vec_double("embedding").alias("qvec"),
                    F.col("label").alias("qlabel"))
            .withColumn("nq", D.norm("qvec")))
    corpus = (emb.where(F.col("vec_id") != 0)
                 .select("vec_id", "label",
                         D.vec_double("embedding").alias("vec"))
                 .withColumn("nvec", D.norm("vec")))
    score = D.safe_div(D.dot("vec", "qvec"), F.col("nvec") * F.col("nq"))
    topk = (corpus.crossJoin(F.broadcast(q))
                  .select("vec_id", "label", "qlabel",
                          score.alias("score"))
                  .orderBy(F.desc("score"), "vec_id").limit(EVAL_K))
    # positions over the bounded top-k — array shape, no window
    arr = topk.agg(F.array_sort(F.collect_list(F.struct(
        (-F.col("score")).alias("_ns"), F.col("vec_id").alias("vec_id"),
        F.col("label").alias("label"),
        F.col("qlabel").alias("qlabel")))).alias("a"))
    ranked = (arr.select(F.posexplode("a").alias("_pos", "_s"))
                 .select((F.col("_pos") + 1).alias("pos"),
                         F.col("_s.label").alias("label"),
                         F.col("_s.qlabel").alias("qlabel")))
    hits = ranked.agg(
        F.coalesce(F.sum(F.when(F.col("label") == F.col("qlabel"),
                                1.0 / F.log2(F.col("pos") + 1))),
                   F.lit(0.0)).alias("dcg"),
        F.count_if(F.col("label") == F.col("qlabel")).alias("n_rel_hits"))
    rel = (corpus.crossJoin(F.broadcast(q.select("qlabel")))
                 .where(F.col("label") == F.col("qlabel"))
                 .agg(F.count("*").alias("n_relevant")))
    # greatest(…, 1): with n_relevant = 0, Spark's sequence(1, 0)
    # yields [1, 0] (descending-range pitfall, functions/text.py)
    # while DuckDB's range(1, 1) is empty — guard BOTH sides so the
    # engines agree even on a label with no other members.
    idcg = F.expr(
        f"aggregate(sequence(1, least(greatest(n_relevant, 1), {EVAL_K})), "
        "0D, (acc, i) -> acc + 1.0 / log2(i + 1))")
    return (hits.crossJoin(F.broadcast(rel))
                .select(
        F.round(F.col("n_rel_hits") / F.lit(float(EVAL_K)), 6)
         .alias("precision_at_k"),
        F.round(F.col("n_rel_hits")
                / F.least(F.greatest(F.col("n_relevant"), F.lit(1)),
                          F.lit(EVAL_K)), 6)
         .alias("recall_at_k"),
        F.round(F.col("dcg") / idcg, 6).alias("ndcg_at_k"),
        F.col("n_relevant").cast("long").alias("n_relevant")))
