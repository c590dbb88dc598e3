"""Similarity self-join at scale (SURVEY §2.2 V10 scale path): all
vector pairs with cosine >= tau, WITHOUT a quadratic crossJoin.

Shape: random-hyperplane signatures (map-only) -> band keys (b bands
of r sign bits) -> candidate pairs inside band buckets (shuffle on the
band key, uniform for centered data) -> exact cosine verify on the
candidate set only. Probability a true pair at angle theta collides in
some band: 1 - (1 - p^r)^b with p = 1 - theta/pi, so b/r tune the
recall/cost point exactly like MinHash-LSH does for Jaccard.

The embarrassingly-exact twin (sampled brute force) is the
`embed_near_dup` oracle query in operators/dedup.py; recall of THIS
operator against full brute force is pinned by tests/test_simjoin.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import distance as D
from .index import lsh_planes, lsh_signature

SIM_BANDS = 4
SIM_ROWS = 4  # bits per band


def similarity_join(corpus: DataFrame, threshold: float, dim: int,
                    id_col: str = "vec_id", vec_col: str = "vec",
                    bands: int = SIM_BANDS, rows: int = SIM_ROWS,
                    seed: int = 42,
                    bucket_cap: int | None = None) -> DataFrame:
    """Pairs (id_a < id_b, score >= threshold). One signature pass,
    one banded self-join, exact verify on candidates.

    `bucket_cap` bounds hot-bucket pair blow-up exactly like
    dedup.lsh_candidate_pairs: only the cap lowest-id vectors per
    (band, key) bucket enter the pair join."""
    planes = lsh_planes(dim, planes=bands * rows, seed=seed)
    sig = corpus.withColumn("sig", lsh_signature(vec_col, planes)) \
                .withColumn("nrm", D.norm(vec_col))
    banded = sig.select(
        id_col, vec_col, "nrm",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("sig", i * rows)
                      .bitwiseAND(F.lit((1 << rows) - 1)).alias("key"))
            for i in range(bands)])).alias("bk")
    ).select(id_col, vec_col, "nrm", "bk.band", "bk.key")
    if bucket_cap is not None:
        wcap = Window.partitionBy("band", "key").orderBy(id_col)
        banded = (banded.withColumn("_rn", F.row_number().over(wcap))
                        .where(F.col("_rn") <= bucket_cap).drop("_rn"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col(f"a.{vec_col}").alias("va"),
                     F.col(f"b.{vec_col}").alias("vb"),
                     F.col("a.nrm").alias("na"),
                     F.col("b.nrm").alias("nb"))
             .dropDuplicates(["id_a", "id_b"]))
    score = D.safe_div(D.dot("va", "vb"), F.col("na") * F.col("nb"))
    return (pairs.select("id_a", "id_b", score.alias("score"))
                 .where(F.col("score") >= threshold))
