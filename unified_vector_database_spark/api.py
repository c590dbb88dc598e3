"""Unified search facade — the "one request API over every backend"
that IS the reference's product (reference README.md:88-91: the app
selects a backend via `VECTOR_DB=chroma|elastic|milvus|qdrant|
weaviate|faiss` behind a single client surface). Here the one backend
is Spark, and a request spec compiles to ONE declarative DataFrame
plan that Catalyst optimizes end to end.

Spec shape (the common denominator of the Qdrant/Milvus/Weaviate
query DSLs — every key optional except `limit` defaults):

    {
      "vector": [..float..],          # dense query vector
      "metric": "cosine"|"dot"|"l2",  # default cosine
      "limit": 10, "offset": 0,
      "score_threshold": 0.25,        # radius / min_score knob
      "filter": {
        "must":     [{"key": "label", "match": 3},
                     {"key": "vec_id", "range": {"gte": 0, "lt": 400}},
                     {"key": "label", "any": [1, 2, 3]}],
        "must_not": [ ...same condition forms... ],
      },
      "group_by": {"key": "label", "group_size": 2},
      "with_payload": ["label"],      # extra columns to return
    }

Compilation rules (scale posture):
- filter conditions become `where` clauses BELOW the scorer, so
  Catalyst pushes them into the parquet scan (plan-asserted in
  tests/test_api.py);
- the query vector is one broadcast row; scoring is map-side JVM
  arithmetic (functions/distance.py) — never a UDF;
- plain top-k compiles to TakeOrderedAndProject; `group_by` ranks
  inside a window PARTITIONED by the group key (bounded partitions),
  `limit` then counts GROUPS ranked by best hit (Qdrant/Milvus group
  search) and the ≤limit winner set broadcasts back into the plan;
  `offset` pages through the bounded top slice only (and is rejected
  under `group_by`, matching the backends' group-search APIs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .functions import distance as D
from .registry import register

_ASC_METRICS = {m for m, asc in D.ASCENDING.items() if asc}


def _condition(c: dict) -> Column:
    col = F.col(c["key"])
    if "match" in c:
        return col == F.lit(c["match"])
    if "any" in c:
        return col.isin(*c["any"])
    if "range" in c:
        r, parts = c["range"], []
        ops = {"gte": col.__ge__, "gt": col.__gt__,
               "lte": col.__le__, "lt": col.__lt__}
        for name, op in ops.items():
            if name in r:
                parts.append(op(F.lit(r[name])))
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out
    raise ValueError(f"unknown condition {c!r}")


def compile_filter(spec: dict | None) -> Column | None:
    if not spec:
        return None
    out = None
    for c in spec.get("must", ()):
        cond = _condition(c)
        out = cond if out is None else out & cond
    for c in spec.get("must_not", ()):
        cond = ~_condition(c)
        out = cond if out is None else out & cond
    return out


def search(corpus: DataFrame, spec: dict,
           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Compile a unified request spec against a corpus DataFrame (a
    `Collection.read()` result or any frame with an id + vector
    column) into a single declarative plan."""
    metric = spec.get("metric", "cosine")
    limit = int(spec.get("limit", 10))
    offset = int(spec.get("offset", 0))
    payload = tuple(spec.get("with_payload", ()))

    df = corpus
    pred = compile_filter(spec.get("filter"))
    if pred is not None:
        df = df.where(pred)

    group = spec.get("group_by")
    if group and group["key"] not in payload:
        payload = (*payload, group["key"])
    cols = [F.col(id_col), *[F.col(p) for p in payload]]
    if "vector" in spec:
        if metric not in D.METRICS:
            raise ValueError(f"unknown metric {metric!r}")
        qvec = F.array(*[F.lit(float(x)) for x in spec["vector"]])
        score = D.METRICS[metric](D.vec_double(vec_col), qvec)
        df = df.select(*cols, score.alias("score"))
        if "score_threshold" in spec:
            thr = float(spec["score_threshold"])
            df = df.where(F.col("score") <= thr if metric in _ASC_METRICS
                          else F.col("score") >= thr)
        order = (F.col("score").asc() if metric in _ASC_METRICS
                 else F.col("score").desc())
        if group:
            if offset:
                raise ValueError("offset is not supported with group_by "
                                 "(matches Qdrant/Milvus group search)")
            # Qdrant/Milvus group-search semantics: `limit` counts
            # GROUPS, not points. Rank hits inside each group (bounded
            # partitions — group-key cardinality), then rank groups by
            # their best hit and keep the top `limit`; the winner set
            # is ≤limit rows so it broadcasts back into the plan, and
            # the output gets a deterministic (group rank, rank) order.
            gkey = group["key"]
            w = W.partitionBy(gkey).orderBy(order, F.col(id_col))
            ranked = (df.withColumn("rank", F.row_number().over(w))
                        .where(F.col("rank")
                               <= int(group.get("group_size", 1))))
            gorder = (F.col("_gbest").asc() if metric in _ASC_METRICS
                      else F.col("_gbest").desc())
            top_groups = (ranked.where(F.col("rank") == 1)
                                .select(F.col(gkey).alias("_gk"),
                                        F.col("score").alias("_gbest"),
                                        F.col(id_col).alias("_gid"))
                                .orderBy(gorder, "_gid")
                                .limit(limit))
            return (ranked.join(F.broadcast(top_groups),
                                F.col(gkey) == F.col("_gk"))
                          .orderBy(gorder, "_gid", "rank")
                          .drop("_gk", "_gbest", "_gid"))
        if offset:
            # page via the bounded-ranks shape (hybrid.bounded_ranks):
            # TakeOrdered cuts to offset+limit rows first, then an
            # array-sort ranks them with NO window operator — a global
            # rank window would run single-partition even over the
            # bounded slice (Catalyst folds literal partition keys)
            top = df.orderBy(order, F.col(id_col)).limit(offset + limit)
            sign = 1.0 if metric in _ASC_METRICS else -1.0
            arr = top.agg(F.array_sort(F.collect_list(F.struct(
                (F.col("score") * sign).alias("_ns"),
                F.col(id_col).alias("_id"),
                F.struct("score", *payload).alias("_row")))).alias("a"))
            return (arr.select(F.posexplode("a").alias("_pos", "_s"))
                       .where(F.col("_pos") >= offset)
                       .select(F.col("_s._id").alias(id_col),
                               *[F.col(f"_s._row.{p}").alias(p)
                                 for p in payload],
                               F.col("_s._row.score").alias("score")))
        return df.orderBy(order, F.col(id_col)).limit(limit)

    # no vector: a filtered scroll page in id order; offset pages via
    # the bounded-ranks shape (TakeOrdered to offset+limit rows, then
    # array-sort ranks the slice — no unpartitioned window)
    page = df.select(*cols).orderBy(id_col).limit(offset + limit)
    if not offset:
        return page
    arr = page.agg(F.array_sort(F.collect_list(F.struct(
        F.col(id_col).alias("_id"),
        F.struct(*payload).alias("_row") if payload
        else F.lit(0).alias("_row")))).alias("a"))
    return (arr.select(F.posexplode("a").alias("_pos", "_s"))
               .where(F.col("_pos") >= offset)
               .select(F.col("_s._id").alias(id_col),
                       *[F.col(f"_s._row.{p}").alias(p) for p in payload]))


def count(corpus: DataFrame, spec: dict | None = None) -> DataFrame:
    """Qdrant/Milvus count API: number of records matching the spec's
    filter — one partial-agg'd aggregate, filter pushed to the scan."""
    pred = compile_filter((spec or {}).get("filter"))
    df = corpus if pred is None else corpus.where(pred)
    return df.agg(F.count("*").alias("n"))


def search_batch(corpus: DataFrame, specs: list[dict],
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Qdrant search_batch / Milvus multi-request search: each spec
    compiles independently (its own filters/metric/limit) and the
    results union with a `query_idx` discriminator. Per-spec plans
    stay bounded (TakeOrdered cuts), so the union is ≤ Σ limits rows;
    Spark schedules the per-spec scans concurrently."""
    parts = [
        search(corpus, spec, id_col=id_col, vec_col=vec_col)
        .withColumn("query_idx", F.lit(i))
        for i, spec in enumerate(specs)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


# ---- driver-checked facade query: the full spec surface in one run ----

_COS = ("list_dot_product(embedding::DOUBLE[], qvec)"
        "/(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
        "*sqrt(list_dot_product(qvec, qvec)))")


@register("unified_search", oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label, {_COS} AS score
FROM embeddings, q
WHERE label IN (1, 2, 3) AND label <> 2
  AND vec_id >= 10 AND vec_id < 400
  AND {_COS} >= 0.1
ORDER BY score DESC, vec_id
LIMIT 10
""")
def unified_search(spark, sf_dir: str):
    """The facade exercised end to end: must/must_not/range filter +
    cosine knn + score threshold + payload, compiled from one request
    spec. The query vector is fetched as the API's caller would pass
    it (a 64-float literal — its values are the float32 bits both
    engines widen identically)."""
    from . import tables
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")
    [qrow] = emb.where(F.col("vec_id") == 0).collect()
    spec = {
        "vector": [float(x) for x in qrow.embedding],
        "metric": "cosine",
        "limit": 10,
        "score_threshold": 0.1,
        "with_payload": ["label"],
        "filter": {
            "must": [{"key": "label", "any": [1, 2, 3]},
                     {"key": "vec_id", "range": {"gte": 10, "lt": 400}}],
            "must_not": [{"key": "label", "match": 2}],
        },
    }
    return search(emb, spec)
