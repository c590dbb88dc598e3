"""Catalog lifecycle census + typed-payload ingest (r5).

Two driver-hash queries that upgrade components previously validated
only by pytest (VERDICT r4 "Next round" #5, #9):

- `catalog_semantics`: one query driving the WHOLE collection
  lifecycle — create, bulk ingest, keep-latest upsert, alias swap,
  snapshot, update-by-filter, delete-by-filter, compact, vacuum,
  stats — then reading the survivors back THROUGH THE ALIAS and
  rolling them into a label census. The oracle recomputes the same
  composition relationally, so C1/C9/C10/C12 get a content-preserving
  hash row, not just unit tests.
- `nested_payload_typed`: the ingest-side answer to C14's
  schema-on-read JSON parse (VERDICT r4 "What's wrong" #2): the JSON
  payload field is materialized ONCE as a typed column through the
  catalog's partitioned commit path (C14 ∘ S5), and the query-time
  predicate then reaches the parquet scan as a PushedFilter —
  plan-asserted in tests/test_plans.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import flags, tables
from ..registry import register
from ..sources.catalog import Collection
from .index import artifact_path
from .search_more import PAYLOAD_K_LO, PAYLOAD_K_HI

CAT_MAX_ID = 500
CAT_BATCH_ID = 50


@register("catalog_semantics", oracle=f"""
WITH base AS (
  SELECT vec_id, label FROM embeddings WHERE vec_id < {CAT_MAX_ID}),
up AS (
  SELECT vec_id, label + 100 AS label
  FROM base WHERE vec_id < {CAT_BATCH_ID}),
merged AS (
  SELECT b.vec_id, b.label FROM base b WHERE b.vec_id >= {CAT_BATCH_ID}
  UNION ALL SELECT vec_id, label FROM up),
updated AS (
  SELECT vec_id,
         CASE WHEN label >= 100 THEN label + 1000 ELSE label END AS label
  FROM merged),
final AS (SELECT * FROM updated WHERE NOT vec_id % 7 = 0)
SELECT label, count(*) AS n FROM final GROUP BY label ORDER BY label
""")
def catalog_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C2/C9/C10/C12/I6 census: the full lifecycle executed against
    a real on-disk collection — create → ingest → upsert → alias →
    snapshot → update → delete → compact → vacuum → stats — and the
    surviving rows read back through the ALIAS (blue-green pointer)
    post-compaction. Every step is the copy-on-write commit the
    catalog uses in production (sources/catalog.py); the label census
    hash-matches the relational composition, proving no lifecycle
    step lost or duplicated a row. Layout ops (compact/vacuum/
    snapshot) are content-neutral BY CONTRACT — that contract is
    exactly what the hash check pins."""
    emb = (tables.load(spark, sf_dir, "embeddings")
           .select("vec_id", "label").where(F.col("vec_id") < CAT_MAX_ID))
    if flags.SCHEMA_ONLY:
        final = emb.limit(0)
    else:
        base = artifact_path("catalog_census", sf_dir)
        if os.path.exists(base):
            shutil.rmtree(base)  # deterministic rebuild per call
        c = Collection.create(spark, base, "census", id_col="vec_id")
        c.upsert(emb)
        c.upsert(emb.where(F.col("vec_id") < CAT_BATCH_ID)
                    .select("vec_id", (F.col("label") + 100).alias("label")))
        Collection.set_alias(base, "prod", "census")
        c.snapshot("pre_update")
        c.update(F.col("label") >= 100, label=F.col("label") + 1000)
        c.delete(F.col("vec_id") % 7 == 0)
        c.compact()
        c.vacuum()  # snapshot-pinned + current versions survive
        st = c.stats()
        if st["versions_retained"] < 2:  # snapshot must survive vacuum
            # not `assert`: the retention contract has to hold in
            # production driver runs too, including under python -O
            raise RuntimeError(
                f"vacuum dropped the pinned snapshot version: {st}")
        final = Collection.open_alias(spark, base, "prod").read()
    return (final.groupBy("label").agg(F.count("*").alias("n"))
                 .orderBy("label"))


@register("nested_payload_typed", oracle=f"""
WITH p AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k,
         value
  FROM events)
SELECT event_type,
       count(*) AS n,
       CAST(min(k) AS INT) AS min_k,
       CAST(max(k) AS INT) AS max_k,
       round(CAST(sum(CAST(k AS BIGINT)) AS DOUBLE) / count(*), 6) AS avg_k,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM p WHERE k BETWEEN {PAYLOAD_K_LO} AND {PAYLOAD_K_HI}
GROUP BY 1 ORDER BY 1
""")
def nested_payload_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 ∘ S5 (the 100 TB form of nested_payload_filter): the JSON
    payload field parses ONCE at ingest into a typed INT column,
    committed through the catalog's hive-partitioned layout
    (partition_by=[event_type]); the query-time range predicate on
    `k` then lands in the parquet scan as a PushedFilter instead of a
    per-row JSON parse (plan-asserted in tests/test_plans.py). Same
    semantics and oracle as the schema-on-read fallback
    (operators/search_more.py:313)."""
    ev = tables.load(spark, sf_dir, "events")
    typed = ev.select(
        "event_id", "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"), "value")
    if flags.SCHEMA_ONLY:
        t = typed.limit(0)
    else:
        base = artifact_path("typed_payload", sf_dir)
        try:
            col = Collection.open(spark, base, "events_typed")
        except ValueError:
            col = Collection.create(spark, base, "events_typed",
                                    id_col="event_id",
                                    partition_by=["event_type"])
            col.upsert(typed)
        t = col.read()
    return (t.where(F.col("k").between(PAYLOAD_K_LO, PAYLOAD_K_HI))
             .groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.min("k").cast("int").alias("min_k"),
                  F.max("k").cast("int").alias("max_k"),
                  F.round(F.sum(F.col("k").cast("bigint")).cast("double")
                          / F.count("*"), 6).alias("avg_k"),
                  F.sum(F.col("value").cast("decimal(18,2)"))
                   .cast("double").alias("total_value"))
             .orderBy("event_type"))


TENANT = "click"


@register("tenant_scoped_scan", oracle=f"""
SELECT count(*) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(min(k) AS INT) AS min_k, CAST(max(k) AS INT) AS max_k
FROM (SELECT user_id, value,
             CAST(json_extract(props, '$.k') AS INT) AS k
      FROM events WHERE event_type = '{TENANT}')
""")
def tenant_scoped_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weaviate multi-tenancy / Milvus partition-key semantics: a
    tenant's queries touch ONLY that tenant's shard. The collection
    commits hive-partitioned on the tenant column (S5), so the tenant
    predicate prunes at the FILE LISTING — PartitionFilters, zero
    bytes of other tenants read (plan-asserted in tests/test_plans.py).
    Reuses the typed-payload collection (tenant = event_type), so the
    same layout serves C14's pushed predicate AND tenant isolation."""
    ev = tables.load(spark, sf_dir, "events")
    typed = ev.select(
        "event_id", "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"), "value",
        "user_id")
    if flags.SCHEMA_ONLY:
        t = typed.limit(0)
    else:
        base = artifact_path("tenant_events", sf_dir)
        try:
            col = Collection.open(spark, base, "events_tenant")
        except ValueError:
            col = Collection.create(spark, base, "events_tenant",
                                    id_col="event_id",
                                    partition_by=["event_type"])
            col.upsert(typed)
        t = col.read()
    return (t.where(F.col("event_type") == TENANT)
             .agg(F.count("*").alias("n"),
                  F.countDistinct("user_id").cast("long").alias("n_users"),
                  F.sum(F.col("value").cast("decimal(18,2)"))
                   .cast("double").alias("total_value"),
                  F.min("k").cast("int").alias("min_k"),
                  F.max("k").cast("int").alias("max_k")))


TT_MAX_ID = 300


@register("snapshot_time_travel", oracle=f"""
WITH v1 AS (
  SELECT vec_id, label FROM embeddings WHERE vec_id < {TT_MAX_ID}),
v2 AS (
  SELECT vec_id,
         CASE WHEN vec_id % 5 = 0 THEN label + 50 ELSE label END AS label
  FROM v1),
j AS (
  SELECT v1.label AS old_label, v2.label AS new_label
  FROM v1 JOIN v2 USING (vec_id))
SELECT old_label, new_label, count(*) AS n
FROM j GROUP BY old_label, new_label ORDER BY old_label, new_label
""")
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6 driven end-to-end: ingest v1, pin snapshot tag, update to
    v2, then read the PINNED TAG and the CURRENT version side by side
    and join them — the time-travel read must see pre-update labels
    while the current read sees post-update ones, with the manifest
    pointer untouched (read(tag=…) never mutates). The (old, new)
    label census hash-matches the relational composition; a drifted
    snapshot (tag following the head, the classic pointer bug) would
    collapse old_label onto new_label and break the hash."""
    emb = (tables.load(spark, sf_dir, "embeddings")
           .select("vec_id", "label").where(F.col("vec_id") < TT_MAX_ID))
    upd_label = F.when(F.col("vec_id") % 5 == 0, F.col("label") + 50) \
                 .otherwise(F.col("label"))
    if flags.SCHEMA_ONLY:
        v1 = emb.limit(0)
        v2 = v1.select("vec_id", upd_label.alias("label"))
    else:
        base = artifact_path("catalog_tt", sf_dir)
        if os.path.exists(base):
            shutil.rmtree(base)  # deterministic rebuild per call
        c = Collection.create(spark, base, "tt", id_col="vec_id")
        c.upsert(emb)
        c.snapshot("pinned")
        c.update(F.col("vec_id") % 5 == 0, label=F.col("label") + 50)
        v1 = c.read(tag="pinned")
        v2 = c.read()
    j = (v1.select("vec_id", F.col("label").alias("old_label"))
           .join(v2.select("vec_id", F.col("label").alias("new_label")),
                 "vec_id"))
    return (j.groupBy("old_label", "new_label")
             .agg(F.count("*").alias("n"))
             .orderBy("old_label", "new_label"))
