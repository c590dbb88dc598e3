"""Remaining TPC-H query classes — Q2, Q11, Q12, Q16, Q20 — closing
the relational-substrate inventory (SURVEY §2.8 R29-R33) alongside
analytics.py and tpch_extra.py.

The test schema is a slimmed TPC-H with no partsupp relation, so the
partsupp-based classes are re-expressed with lineitem standing in as
the supply relation (a part is "supplied by" the suppliers that ship
it; its supply cost is the minimum observed unit price). Each
re-expression keeps the plan shape that makes the query class
interesting:

- Q2: correlated min over a group (min-cost supplier per part) →
  decorrelated as a per-part window min + equality filter.
- Q11: group value vs a global scalar threshold (uncorrelated scalar
  subquery) → exact-decimal total, 1-row broadcast crossJoin.
- Q12: fact-fact join + conditional (CASE) counts per category.
- Q16: count-distinct rollup after a NOT-IN supplier blacklist →
  broadcast anti-join before the distinct agg.
- Q20: nested semi-join chain (suppliers with a dominant share of a
  part's shipped quantity) → per-pair agg, per-part window total,
  ratio filter, distinct supplier rollup.

Determinism rules (same policy as tpch_extra.py): money sums
accumulate as DECIMAL(18,4) (exact, order-independent) and cast to
DOUBLE only in the final select; quantities are integer-valued
doubles (sums exact); min/max over doubles are order-independent; the
Q11 threshold divides an exact decimal total by a count in double —
bit-identical across engines regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..registry import register


def _volume() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register("q2_min_cost_supplier", oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
scoped AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, supply_cost,
         min(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM supply JOIN part ON l_partkey = p_partkey
  JOIN eu_supp ON l_suppkey = s_suppkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM scoped WHERE supply_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 class: the minimum-cost supplier for each part in a
    region (supply relation re-expressed on lineitem — no partsupp in
    the slim schema; supply cost := min unit price shipped).

    Plan shape: the part scope filter and the region supplier
    semi-join are both pushed BELOW the (partkey, suppkey) aggregate,
    so the shuffle groups only in-scope rows. The correlated min is a
    window partitioned by partkey — same partitioning the agg just
    produced, so AQE plans it shuffle-free. Supplier payload joins
    back via broadcast. One real shuffle total; doubles compared for
    equality are min() results (order-independent) — deterministic."""
    part_sc = (tables.load(spark, sf_dir, "part")
               .where(F.col("p_size").between(10, 20)
                      & (F.col("p_type") == "LARGE"))
               .select("p_partkey", "p_name"))
    nat = tables.load(spark, sf_dir, "nation")
    region = (tables.load(spark, sf_dir, "region")
              .where(F.col("r_name") == "EUROPE"))
    eu = (tables.load(spark, sf_dir, "supplier")
          .join(F.broadcast(nat.join(F.broadcast(region),
                                     F.col("n_regionkey") == F.col("r_regionkey"))
                            .select("n_nationkey", "n_name")),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    li = tables.load(spark, sf_dir, "lineitem")
    supply = (li.join(F.broadcast(part_sc),
                      F.col("l_partkey") == F.col("p_partkey"))
                .join(F.broadcast(eu.select("s_suppkey")),
                      F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
                .groupBy("p_partkey", "p_name", "l_suppkey")
                .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                      .alias("supply_cost")))
    w = W.partitionBy("p_partkey")
    return (supply.withColumn("min_cost", F.min("supply_cost").over(w))
                  .where(F.col("supply_cost") == F.col("min_cost"))
                  .join(F.broadcast(eu),
                        F.col("l_suppkey") == F.col("s_suppkey"))
                  .select("s_acctbal", "s_name", "n_name", "p_partkey",
                          "p_name", "supply_cost")
                  .orderBy(F.desc("s_acctbal"), "n_name", "s_name",
                           "p_partkey")
                  .limit(100))


@register("q11_important_parts", oracle="""
WITH val AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS dvalue
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_8')
  GROUP BY l_partkey),
thr AS (SELECT 2.0 * (CAST(sum(dvalue) AS DOUBLE) / count(*)) AS cutoff
        FROM val)
SELECT p_partkey, CAST(dvalue AS DOUBLE) AS value
FROM val, thr
WHERE CAST(dvalue AS DOUBLE) > cutoff
ORDER BY value DESC, p_partkey
""")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 class: parts whose shipped value (for two nations'
    suppliers) exceeds a global scalar threshold — the uncorrelated
    scalar-subquery shape. The TPC-H fraction is SF-dependent; here
    the threshold is scale-free: 2x the mean per-part value.

    Plan shape: supplier scope broadcasts into the lineitem scan; one
    shuffle builds the per-part values; the threshold is a 1-row agg
    broadcast back via crossJoin (the q15 pattern — no collect). The
    threshold divides an exact decimal total by a count, in double —
    both engines compute the identical scalar, so the cutoff
    comparison is bit-deterministic."""
    nat = (tables.load(spark, sf_dir, "nation")
           .where(F.col("n_name").isin("NATION_3", "NATION_8")))
    sup = (tables.load(spark, sf_dir, "supplier")
           .join(F.broadcast(nat),
                 F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
           .select("s_suppkey"))
    li = tables.load(spark, sf_dir, "lineitem")
    val = (li.join(F.broadcast(sup),
                   F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
             .groupBy(F.col("l_partkey").alias("p_partkey"))
             .agg(F.sum(_volume().cast("decimal(18,4)")).alias("dvalue")))
    thr = val.agg((F.lit(2.0) * (F.sum("dvalue").cast("double")
                                 / F.count("*"))).alias("cutoff"))
    return (val.crossJoin(F.broadcast(thr))
               .where(F.col("dvalue").cast("double") > F.col("cutoff"))
               .select("p_partkey",
                       F.col("dvalue").cast("double").alias("value"))
               .orderBy(F.desc("value"), "p_partkey"))


@register("q12_priority_by_returnflag", oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""")
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 class: fact-fact join + CASE-conditional counts per
    category (l_returnflag stands in for shipmode — the slim schema
    has no l_shipmode).

    Plan shape: the shipdate year filter is pushed to the lineitem
    parquet scan; lineitem and orders meet in one co-partitioned
    equi-join on orderkey; the conditional counts partial-aggregate
    map-side into 3 groups. Integer counts — trivially exact."""
    li = tables.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    orders = tables.load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .groupBy("l_returnflag")
              .agg(F.sum(F.when(high, 1).otherwise(0))
                    .alias("high_line_count"),
                   F.sum(F.when(~high, 1).otherwise(0))
                    .alias("low_line_count"))
              .orderBy("l_returnflag"))


@register("q16_supplier_counts", oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""")
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 class: distinct-supplier counts per part attribute
    triple, excluding a blacklist (negative-balance suppliers stand in
    for the 'complaints' predicate — no comment column in the slim
    schema).

    Plan shape: the NOT IN becomes a broadcast left_anti join (the
    blacklist is a handful of keys); part scope broadcasts into the
    lineitem scan; count(DISTINCT) shuffles once on the group triple
    with a partial distinct map-side. All-integer output."""
    part_sc = (tables.load(spark, sf_dir, "part")
               .where((F.col("p_brand") != "Brand#5")
                      & (F.col("p_type") != "PROMO")
                      & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
               .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (tables.load(spark, sf_dir, "supplier")
           .where(F.col("s_acctbal") < 0).select("s_suppkey"))
    li = tables.load(spark, sf_dir, "lineitem")
    return (li.join(F.broadcast(part_sc),
                    F.col("l_partkey") == F.col("p_partkey"))
              .join(F.broadcast(bad),
                    F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
              .groupBy("p_brand", "p_type", "p_size")
              .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
              .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


@register("q20_part_promotion", oracle="""
WITH qty AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey),
flagged AS (
  SELECT l_suppkey, supp_qty,
         sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_total
  FROM qty)
SELECT DISTINCT s_name, n_name
FROM flagged JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE supp_qty > 0.5 * part_total
ORDER BY s_name
""")
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 class: suppliers holding a dominant share (>50%) of
    any scoped part's shipped quantity in a year — the nested
    semi-join-chain shape, decorrelated as agg -> per-part window
    total -> ratio filter -> distinct supplier rollup.

    Plan shape: part-name scope and the shipdate range both push into
    the lineitem scan (broadcast part, parquet filter); one shuffle
    groups (suppkey, partkey); the per-part total is a window on the
    partkey partitioning just produced. Quantities are integer-valued
    doubles, so sums and the 0.5 ratio compare are exact."""
    part_sc = (tables.load(spark, sf_dir, "part")
               .where(F.col("p_name").like("small%")).select("p_partkey"))
    li = tables.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    qty = (li.join(F.broadcast(part_sc),
                   F.col("l_partkey") == F.col("p_partkey"))
             .groupBy("l_suppkey", "l_partkey")
             .agg(F.sum("l_quantity").alias("supp_qty")))
    w = W.partitionBy("l_partkey")
    nat = tables.load(spark, sf_dir, "nation")
    sup = (tables.load(spark, sf_dir, "supplier")
           .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_name", "n_name"))
    return (qty.withColumn("part_total", F.sum("supp_qty").over(w))
               .where(F.col("supp_qty") > 0.5 * F.col("part_total"))
               .join(F.broadcast(sup),
                     F.col("l_suppkey") == F.col("s_suppkey"))
               .select("s_name", "n_name").distinct()
               .orderBy("s_name"))
