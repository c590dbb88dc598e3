"""ES nested-scope aggregation family (the r6 gap VERDICT r5 named
first): `nested`, `reverse_nested`, `children`, and `parent`
aggregations — the four ways the ES DSL switches document scope
INSIDE an aggregation tree (reference surface: the elastic backend,
Aggregations > bucket > nested/reverse_nested/children/parent) —
plus runtime fields (computed at query time, usable in filters and
aggs exactly like mapped fields).

Data model: ES stores nested objects and join-field children as
separate hidden documents keyed to their parent — relationally, the
orders table is the parent docs and lineitem the nested/child docs,
the same modeling the T50/T51 has_child/has_parent QUERIES use; these
ops are their AGGREGATION twins (buckets out, not docs).

Scale shape shared by all three: the parent⋈child join is co-keyed on
the order key (at warehouse scale both sides bucket on it — S4's
layout), child metrics partial-aggregate map-side before the shuffle,
and every output is census-sized (priority/status/returnflag
buckets). Sums accumulate as exact DECIMAL; averages divide once at
the end (merge-order-free, hash-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..registry import register


@register("nested_terms_agg", oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(min(l.l_extendedprice) AS DOUBLE) AS min_price,
       CAST(max(l.l_extendedprice) AS DOUBLE) AS max_price,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_price
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1 ORDER BY 1
""")
def nested_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `nested` aggregation: a parent-level `terms` bucket
    (order priority) whose sub-aggregation steps INTO the nested
    items and computes metrics over nested docs, not parents — each
    parent contributes every one of its items to the bucket stats
    (the defining difference from a plain parent-field agg). Metric
    set mirrors the ES docs' nested-stats example (count/min/max/avg
    over the nested price field)."""
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    # items partial-aggregate to ORDER-level rows BEFORE the join
    # (count/sum/min/max all merge exactly: DECIMAL partial sums add,
    # min-of-mins), so the join shuffles |orders| rows instead of
    # |items| — the 64x probe measured the direct item-level join
    # superlinear (14.7x) and this shape ~linear
    per_ord = (li.groupBy("l_orderkey")
                 .agg(F.count("*").alias("n"),
                      F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                       .alias("s"),
                      F.min("l_extendedprice").alias("mn"),
                      F.max("l_extendedprice").alias("mx")))
    j = orders.join(per_ord, orders.o_orderkey == per_ord.l_orderkey)
    return (j.groupBy("o_orderpriority")
             .agg(F.sum("n").cast("long").alias("n_items"),
                  F.min("mn").cast("double").alias("min_price"),
                  F.max("mx").cast("double").alias("max_price"),
                  F.round(F.sum("s").cast("double") / F.sum("n"), 6)
                   .alias("avg_price"))
             .orderBy("o_orderpriority"))


@register("reverse_nested_agg", oracle="""
WITH pc AS (
  SELECT l.l_returnflag, l.l_orderkey,
         count(*) AS n_items,
         max(CAST(o.o_totalprice AS DECIMAL(18,2))) AS parent_total
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2)
SELECT l_returnflag,
       CAST(sum(n_items) AS BIGINT) AS n_items,
       CAST(count(*) AS BIGINT) AS n_parents,
       round(CAST(sum(parent_total) AS DOUBLE) / count(*), 6)
         AS avg_parent_total
FROM pc GROUP BY 1 ORDER BY 1
""")
def reverse_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `reverse_nested`: a `nested` terms bucket (item returnflag)
    whose sub-aggregation jumps BACK UP to the parent scope — parent
    metrics count each parent ONCE per bucket no matter how many of
    its items landed there (the dedup that distinguishes this from
    joining parent fields down onto items and averaging: that would
    weight parents by item count). Two-stage rollup: items group by
    (bucket, parent) first — the parent-dedup shuffle, co-keyed on
    the composite key — then the census-sized bucket rollup."""
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    # the (bucket, parent) dedup aggregate runs on the ITEM side
    # FIRST (no parent columns needed for it), so the parent join
    # shuffles ~|orders| grouped rows, not raw items
    ipc = (li.groupBy("l_returnflag", "l_orderkey")
             .agg(F.count("*").alias("n_items")))
    pc = (ipc.join(orders, ipc.l_orderkey == orders.o_orderkey)
             .select("l_returnflag", "n_items",
                     F.col("o_totalprice").cast("decimal(18,2)")
                      .alias("parent_total")))
    return (pc.groupBy("l_returnflag")
              .agg(F.sum("n_items").cast("long").alias("n_items"),
                   F.count("*").cast("long").alias("n_parents"),
                   F.round(F.sum("parent_total").cast("double")
                           / F.count("*"), 6).alias("avg_parent_total"))
              .orderBy("l_returnflag"))


@register("children_agg", oracle="""
WITH p AS (
  SELECT o_orderstatus, count(*) AS n_parents FROM orders GROUP BY 1),
c AS (
  SELECT o.o_orderstatus,
         count(*) AS n_children,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS total_qty
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1)
SELECT p.o_orderstatus,
       CAST(p.n_parents AS BIGINT) AS n_parents,
       CAST(c.n_children AS BIGINT) AS n_children,
       c.total_qty
FROM p JOIN c USING (o_orderstatus) ORDER BY 1
""")
def children_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `children` aggregation (join-field twin of `nested`): a
    parent terms bucket (order status) reporting BOTH scopes — the
    parent doc count, and after the children step, the child doc
    count and a child metric (total quantity) — the exact ES response
    shape where the children sub-agg carries its own doc_count beside
    the parent bucket's. The parent census and the child rollup are
    independent aggregates joined on the census key (broadcast-sized
    at 3 status buckets)."""
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    p = orders.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_parents"))
    # children partial-aggregate to order-level rows before the join
    # (the nested_terms_agg shape — counts and DECIMAL sums merge)
    per_ord = (li.groupBy("l_orderkey")
                 .agg(F.count("*").alias("n"),
                      F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                       .alias("q")))
    c = (orders.join(per_ord, orders.o_orderkey == per_ord.l_orderkey)
               .groupBy("o_orderstatus")
               .agg(F.sum("n").cast("long").alias("n_children"),
                    F.sum("q").cast("double").alias("total_qty")))
    return (p.join(F.broadcast(c), "o_orderstatus")
             .select("o_orderstatus", "n_parents", "n_children",
                     "total_qty")
             .orderBy("o_orderstatus"))


@register("parent_agg", oracle="""
WITH cp AS (
  SELECT l.l_linestatus, l.l_orderkey,
         count(*) AS n_children,
         max(CAST(o.o_totalprice AS DECIMAL(18,2))) AS parent_total
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2)
SELECT l_linestatus,
       CAST(sum(n_children) AS BIGINT) AS n_children,
       CAST(count(*) AS BIGINT) AS n_parents,
       CAST(sum(parent_total) AS DOUBLE) AS parent_revenue
FROM cp GROUP BY 1 ORDER BY 1
""")
def parent_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `parent` aggregation — the join-field dual of `children`
    (and the join-field twin of `reverse_nested`, which does the same
    scope jump for nested objects): start in CHILD scope (a terms
    bucket on the child field l_linestatus), then the `parent` step
    jumps up and computes parent-doc metrics, each parent counted
    ONCE per bucket no matter how many of its children landed there.
    Response carries both scopes' doc_counts (child count beside the
    parent-after-dedup count) plus a parent metric summed once per
    parent — the exact ES join-field response shape.

    Scale shape (reverse_nested_agg's): the (bucket, parent) dedup
    aggregate runs on the CHILD side first, co-keyed on the order
    key, so the parent join shuffles ~|orders| grouped rows, never
    raw items; the final rollup is census-sized (2 linestatus
    buckets). DECIMAL partial sums merge exactly."""
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    cpk = (li.groupBy("l_linestatus", "l_orderkey")
             .agg(F.count("*").alias("n_children")))
    cp = (cpk.join(orders, cpk.l_orderkey == orders.o_orderkey)
             .select("l_linestatus", "n_children",
                     F.col("o_totalprice").cast("decimal(18,2)")
                      .alias("parent_total")))
    return (cp.groupBy("l_linestatus")
              .agg(F.sum("n_children").cast("long").alias("n_children"),
                   F.count("*").cast("long").alias("n_parents"),
                   F.sum("parent_total").cast("double")
                    .alias("parent_revenue"))
              .orderBy("l_linestatus"))


RUNTIME_MIN_NET = 2000.0


@register("runtime_field_agg", oracle=f"""
WITH rt AS (
  SELECT l_returnflag,
         CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))),
                    4) AS DECIMAL(22,4)) AS net_price
  FROM lineitem)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(net_price) AS DOUBLE) AS net_revenue,
       round(CAST(sum(net_price) AS DOUBLE) / count(*), 6)
         AS avg_net_price
FROM rt WHERE net_price > {RUNTIME_MIN_NET!r}
GROUP BY 1 ORDER BY 1
""")
def runtime_field_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES runtime fields (the `runtime_mappings` request block): a
    field DEFINED AT QUERY TIME by a script over mapped fields —
    here net_price = extendedprice * (1 - discount) — then used in
    BOTH a range filter and a terms agg's metrics, exactly as if it
    were indexed. The ES promise is schema-on-read; the Spark
    re-expression is simply a projected expression, which Catalyst
    treats as first-class: the filter on the derived column still
    collapses into the scan stage (no materialization pass), and
    only the three source columns are read.

    Hash discipline: the product quantizes to DECIMAL(22,4) before
    summing (round-half-even on both engines at 4 fractional
    digits), so the aggregate is merge-order-free."""
    li = tables.load(spark, sf_dir, "lineitem")
    net = F.round(F.col("l_extendedprice").cast("decimal(18,2)")
                  * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")),
                  4).cast("decimal(22,4)")
    rt = li.select("l_returnflag", net.alias("net_price"))
    return (rt.where(F.col("net_price") > RUNTIME_MIN_NET)
              .groupBy("l_returnflag")
              .agg(F.count("*").cast("long").alias("n_items"),
                   F.sum("net_price").cast("double").alias("net_revenue"),
                   F.round(F.sum("net_price").cast("double")
                           / F.count("*"), 6).alias("avg_net_price"))
              .orderBy("l_returnflag"))
