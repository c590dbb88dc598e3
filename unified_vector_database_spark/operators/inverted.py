"""Inverted-index posting-list layout + impact-ordered BM25 pruning.

Reference analog: every text backend in the reference stack
(Elasticsearch most directly — reference README.md:93 `elasticsearch`
client) serves keyword queries from an inverted index, and prunes
scoring with impact-ordered postings (WAND / block-max WAND family:
Broder et al. CIKM'03, Ding & Suel SIGIR'11). The Spark-native
re-expression has two halves:

1. **Layout** (`build_posting_lists` + `write_inverted_index`): one
   explode + groupBy materializes (term, doc_id, tf, dl) postings,
   written hive-partitioned on `bucket = pmod(hash(term), n)`. A
   query for a handful of terms reads ONLY those buckets — pruned at
   the file listing exactly like the IVF cell layout (plan-asserted
   in tests/test_inverted.py). This is the index build a 100 TB
   corpus runs once, not per query.

2. **Impact-ordered pruning** (`bm25_pruned_search`): instead of
   scoring every document that matches ANY query term, keep only the
   top-IMPACT_N postings per term by their static impact (the
   posting's own BM25 term contribution — Anh & Moffat impact order;
   idf is constant within a term so (tf, dl) determine it), union them into a candidate set, and run the exact
   BM25 formula on candidates alone. Scoring cost becomes
   O(terms × IMPACT_N), independent of how many documents match a
   stopword-ish term. The cut is deterministic (impact desc, doc_id —
   impact values are bit-identical doubles on both engines), so the
   DuckDB oracle reproduces it bit-for-bit. The synthetic corpus is
   near-worst-case for impact ordering (tiny vocabulary, flat tf), so
   IMPACT_N=75 here; Zipfian real corpora cut far deeper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..constants import BM25_B, BM25_K1
from ..functions.text import exploded_tokens, tokens
from ..registry import register
from .hybrid import QUERY_TERMS, _TERMS_SQL, _TOK

IMPACT_N = 75
_BUCKETS = 64


def build_posting_lists(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, dl) — the classic inverted-index relation.
    One explode + one partial-agg'd groupBy; the doc-length column is
    denormalized onto every posting so BM25 needs no second join."""
    tok = exploded_tokens(docs, "doc_id", "text")
    dl = docs.select("doc_id", F.size(tokens("text")).alias("dl"))
    tf = (tok.groupBy("token", "doc_id")
             .agg(F.count("*").alias("tf"))
             .withColumnRenamed("token", "term"))
    return tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")


def write_inverted_index(postings: DataFrame, path: str,
                         n_buckets: int = _BUCKETS) -> None:
    """Hive-partition the postings on a deterministic term-hash bucket
    (Spark `hash` = Murmur3 seed 42, stable across sessions). Term
    lookups prune to their buckets at the file listing."""
    (postings.withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
             .write.mode("overwrite").partitionBy("bucket").parquet(path))


def read_postings(spark: SparkSession, path: str,
                  terms: tuple[str, ...],
                  n_buckets: int = _BUCKETS) -> DataFrame:
    """Read only the buckets the query terms hash into (a tiny
    driver-side job computes the bucket ids — |terms| rows), then the
    exact term filter inside the surviving files."""
    tdf = spark.createDataFrame([(t,) for t in terms], ["term"])
    buckets = sorted({r.b for r in tdf.select(
        F.pmod(F.hash("term"), F.lit(n_buckets)).alias("b")).collect()})
    return (spark.read.parquet(path)
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(*terms)))


def _bm25_on(tf: DataFrame, stats: DataFrame, df: DataFrame) -> DataFrame:
    """Exact BM25 over a (doc_id, term, tf, dl) posting subset."""
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    w = (idf * F.col("tf") * (BM25_K1 + 1.0)
         / (F.col("tf") + BM25_K1 * (1.0 - BM25_B
                                     + BM25_B * F.col("dl") / F.col("avgdl"))))
    return (tf.join(F.broadcast(df), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.round(F.sum(w), 6).alias("score")))


@register("bm25_pruned_search", oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
dl AS (SELECT doc_id, len({_TOK}) AS dl FROM documents),
stats AS (SELECT count(*) AS n, avg(len({_TOK})) AS avgdl FROM documents),
tf AS (SELECT tok.doc_id, term, count(*) AS tf, any_value(dl.dl) AS dl
       FROM tok JOIN dl ON dl.doc_id = tok.doc_id
       WHERE term IN {_TERMS_SQL} GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
imp AS (SELECT doc_id, term,
               row_number() OVER (PARTITION BY term
                  ORDER BY tf * ({BM25_K1} + 1.0)
                           / (tf + {BM25_K1} * (1.0 - {BM25_B}
                              + {BM25_B} * tf.dl / stats.avgdl)) DESC,
                           doc_id) AS rk
        FROM tf, stats),
cand AS (SELECT DISTINCT doc_id FROM imp WHERE rk <= {IMPACT_N}),
bm25 AS (
  SELECT tf.doc_id,
         round(sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                       + {BM25_B} * tf.dl / stats.avgdl))), 6)
           AS score
  FROM tf JOIN cand USING (doc_id) JOIN df USING (term), stats
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT 15
""")
def bm25_pruned_search(spark: SparkSession, sf_dir: str,
                       impact_n: int = IMPACT_N) -> DataFrame:
    """Impact-ordered BM25: candidates = union of each query term's
    top-`impact_n` postings by static impact, exact BM25 on candidates.
    The registered query builds postings inline from the documents
    table so the oracle can mirror it; at scale the tf/df inputs come
    straight from the materialized index (`read_postings`), and the
    corpus is never re-tokenized at query time."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    tok = (exploded_tokens(docs, "doc_id", "text")
           .where(F.col("token").isin(*QUERY_TERMS)))
    dl = docs.select("doc_id", F.size(tokens("text")).alias("dl"))
    tf = (tok.groupBy("doc_id", "token")
             .agg(F.count("*").alias("tf"))
             .withColumnRenamed("token", "term")
             .join(dl, "doc_id"))
    stats = docs.agg(F.count("*").alias("n"),
                     F.avg(F.size(tokens("text"))).alias("avgdl"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    impact = (F.col("tf") * (BM25_K1 + 1.0)
              / (F.col("tf") + BM25_K1 * (1.0 - BM25_B
                 + BM25_B * F.col("dl") / F.col("avgdl"))))
    # Two-phase salted top-N: a term can match an unbounded share of
    # the corpus (stopwords), so a window partitioned on `term` alone
    # would funnel it into one task. Phase 1 ranks within (term, salt)
    # — bounded, uniform partitions — phase 2 re-ranks the surviving
    # terms × SALT × N rows. Identical result to the direct window
    # (every global top-N posting is its salt partition's top-N), with
    # no partition ever exceeding max(corpus/SALT, SALT*N) rows. In
    # the materialized layout the postings are stored impact-sorted,
    # so the query-time cut is a prefix read and no window runs at all.
    salt = F.pmod(F.hash("doc_id"), F.lit(16))
    local_rk = F.row_number().over(
        W.partitionBy("term", "salt").orderBy(impact.desc(), "doc_id"))
    rk = F.row_number().over(W.partitionBy("term")
                              .orderBy(impact.desc(), "doc_id"))
    cand = (tf.crossJoin(F.broadcast(stats))
              .withColumn("salt", salt)
              .withColumn("lrk", local_rk).where(F.col("lrk") <= impact_n)
              .withColumn("rk", rk).where(F.col("rk") <= impact_n)
              .select("doc_id").distinct())
    scored = _bm25_on(tf.join(F.broadcast(cand), "doc_id"), stats, df)
    return scored.orderBy(F.desc("score"), "doc_id").limit(15)
