"""Arrow/numpy fast-path knn (SURVEY §6): the BLAS alternative to the
JVM `F.aggregate` scorer for throughput-bound scans.

The oracle-checked queries keep the JVM scorer (bit-exact vs DuckDB);
this path trades bit-reproducibility (BLAS reassociates the sums) for
a matrix-multiply inner loop — per partition: one np.dot of the batch
against the query block, then a partial top-k, then the global
TakeOrdered merges k rows per partition. At 100 TB this is the scan
you want: Arrow batches amortize the Python boundary and the work per
batch is one GEMV.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..functions import distance as D
from ..registry import register


def knn_arrow(corpus: DataFrame, qvec: list[float], k: int,
              id_col: str = "vec_id", vec_col: str = "vec") -> DataFrame:
    """Cosine top-k with a vectorized per-partition scorer."""
    q = np.asarray(qvec, dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy())
            norms = np.sqrt((m * m).sum(axis=1))
            s = (m @ q) / (norms * qn)
            # partial top-k inside the batch: only k rows leave Python.
            # lexsort on (id, -score) = (score desc, id asc) — a plain
            # argsort(-s)[:k] could drop a row tied with the k-th score
            # that the global order keeps (ADVICE r1).
            ids = pdf[id_col].to_numpy()
            idx = np.lexsort((ids, -s))[:k]
            yield pd.DataFrame({id_col: ids[idx], "score": s[idx]})

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, schema=f"{id_col} long, score double")
    return scored.orderBy(F.desc("score"), id_col).limit(k)


@register("knn_cosine_arrow", oracle="""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings
           WHERE vec_id = 0)
SELECT vec_id, round(score, 6) AS score FROM (
  SELECT vec_id,
         list_dot_product(embedding::DOUBLE[], qvec)
           / (sqrt(list_dot_product(embedding::DOUBLE[],
                                    embedding::DOUBLE[]))
              * sqrt(list_dot_product(qvec, qvec))) AS score
  FROM embeddings, q
  ORDER BY score DESC, vec_id LIMIT 10)
""")
def knn_cosine_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-path knn for the same query as knn_cosine; the id set is
    asserted identical to the JVM path in tests/test_simjoin.py.

    r4: upgraded from rows-only to a full oracle. BLAS reassociates
    the sums, so raw scores differ from the exact fold by ulps; the
    final select rounds to 6 decimals (the repo's standard libm-spread
    absorber) AFTER the raw-score TakeOrdered. Residual risk, accepted
    deliberately: unlike every other round-6 oracle (which rounds two
    bit-identical computations), this one rounds two computations that
    differ by ulps — a corpus where a top-10 score sits within a ulp
    of an x.xxxxxx5 boundary, or where the rank-10/11 raw gap is
    smaller than the reassociation drift, would hash-diverge. On the
    fixed generated test corpora the compare is deterministic and
    green at every SF; if the testdata generator ever changes and this
    row goes red, demote it back to rows-only (identity-to-V1 test)
    rather than chasing the boundary.

    Deliberately NOT load_parallel: the Arrow path wants LARGE batches
    (one GEMV per batch amortizes the Python boundary), so the natural
    parquet splits (one per 128 MB on a cluster) are exactly right —
    a 32-way repartition of a small local file would hand each Python
    worker a ~60-row batch, the Arrow anti-pattern, and pay 32 worker
    spawns for one matrix multiply's worth of work."""
    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", D.vec_double("embedding").alias("vec"))
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).first().embedding]
    return (knn_arrow(corpus, qvec, k=10)
            .select("vec_id", F.round("score", 6).alias("score")))
