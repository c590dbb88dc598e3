"""Extended relational coverage: the TPC-H query classes beyond
analytics.py — nation-pair volume (Q7), market share (Q8), profit by
nation/year (Q9), order-count distribution (Q13), scalar-max top
supplier (Q15), correlated-threshold revenue (Q17), double-EXISTS
self-join (Q21), scalar-threshold anti-join rollup (Q22).

The test schema is a slimmed TPC-H (no partsupp; lineitem lacks
commitdate/receiptdate/shipmode; customer lacks phone), so Q9/Q21/Q22
are re-expressed on the available columns while keeping the plan shape
that makes each query class interesting: Q9's multi-dim star, Q21's
EXISTS + NOT EXISTS against the same fact, Q22's uncorrelated scalar
subquery feeding a filter + anti-join.

Scale rules (see docs/SCALE.md): every dimension (nation, region,
part, supplier, 1-row scalar aggregates) is broadcast; fact-fact
self-joins share one hash partitioning on the join key. Money sums
use exact DECIMAL accumulation: prices/discounts have <=2 decimals,
so volume = price*(1-disc) is exact at 4 decimals and decimal sums
are order-independent — bit-identical across engines regardless of
partitioning (round(sum_double, 2) drifted across a half-cent at
sf0.01 on Q9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..registry import register


def _volume() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register("q7_nation_volume", oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31') AS shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""")
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 class: bidirectional nation-pair trade volume by year.

    Plan shape: nation twice + supplier + customer are all broadcast
    (supplier/customer are ~1e-4 of lineitem at TPC-H ratios); the
    pair predicate lands after both dims are attached, so lineitem is
    scanned once with the shipdate range pushed to parquet. One
    shuffle total (the final 3-key groupBy)."""
    nat = tables.load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2"))
    sup = (tables.load(spark, sf_dir, "supplier")
           .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (tables.load(spark, sf_dir, "customer")
            .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    li = tables.load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(F.lit("1996-01-01").cast("timestamp"),
                                    F.lit("1997-12-31").cast("timestamp")))
    orders = tables.load(spark, sf_dir, "orders")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
              .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
              .where(F.col("supp_nation") != F.col("cust_nation"))
              .groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").alias("l_year"))
              .agg(F.sum(_volume().cast("decimal(18,4)")).cast("double")
                    .alias("revenue"))
              .orderBy("supp_nation", "cust_nation", "l_year"))


@register("q8_market_share", oracle="""
SELECT o_year,
       round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_7'
                           THEN volume ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
FROM (SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31') AS all_nations
GROUP BY o_year
ORDER BY o_year
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 class: one nation's share of regional order volume per
    year — conditional aggregate over an 7-table star.

    Every non-fact input (part filtered to one type, supplier+nation,
    customer semi-joined to the ASIA region) broadcasts; lineitem and
    orders meet in the single fact-fact shuffle. Both sums accumulate
    as exact decimals, then one double division + round — the share
    is bit-deterministic."""
    part = tables.load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    nat = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_keys = (nat.join(F.broadcast(region),
                          nat.n_regionkey == region.r_regionkey)
                 .select(F.col("n_nationkey").alias("asia_nationkey")))
    cust = (tables.load(spark, sf_dir, "customer")
            .join(F.broadcast(asia_keys),
                  F.col("c_nationkey") == F.col("asia_nationkey"), "left_semi")
            .select("c_custkey"))
    sup = (tables.load(spark, sf_dir, "supplier")
           .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    orders = tables.load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(F.lit("1996-01-01").cast("timestamp"),
                                     F.lit("1997-12-31").cast("timestamp")))
    li = tables.load(spark, sf_dir, "lineitem")
    vol = _volume()
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
              .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
              .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
              .groupBy(F.year("o_orderdate").alias("o_year"))
              .agg(F.sum(F.when(F.col("supp_nation") == "NATION_7", vol)
                          .otherwise(F.lit(0.0))
                          .cast("decimal(18,4)")).cast("double").alias("num"),
                   F.sum(vol.cast("decimal(18,4)")).cast("double").alias("den"))
              .select("o_year",
                      F.round(F.col("num") / F.col("den"), 6).alias("mkt_share"))
              .orderBy("o_year"))


@register("q9_profit_by_nation", oracle="""
SELECT nation, o_year,
       CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%') AS profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""")
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 class (no partsupp in the slim schema, so profit =
    discounted revenue): per supplier-nation, per order-year, over
    parts whose name matches a pattern.

    part (LIKE-filtered, broadcast) prunes lineitem early; supplier x
    nation collapses to a 2-column broadcast map; one fact-fact
    shuffle (lineitem x orders on orderkey), one groupBy shuffle."""
    part = tables.load(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")).select("p_partkey")
    nat = tables.load(spark, sf_dir, "nation")
    sup = (tables.load(spark, sf_dir, "supplier")
           .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", F.col("n_name").alias("nation")))
    orders = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = tables.load(spark, sf_dir, "lineitem")
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
              .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
              .groupBy("nation", F.year("o_orderdate").alias("o_year"))
              .agg(F.sum(_volume().cast("decimal(18,4)")).cast("double")
                    .alias("sum_profit"))
              .orderBy(F.col("nation"), F.col("o_year").desc()))


@register("q13_order_distribution", oracle="""
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority = '1-URGENT'
      GROUP BY c_custkey) AS c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 class: distribution of per-customer order counts,
    with the filter inside the LEFT JOIN condition so zero-order
    customers survive into the c_count=0 bucket.

    Orders pre-aggregates to (custkey, cnt) BEFORE the outer join —
    at scale that turns a fact-size outer join into dim-size (one
    row per customer), and the pre-agg is partial/map-side. The outer
    join keeps customer as build side only if broadcast; at TPC-H
    ratios customers are 10x orders' distinct keys, so shuffle-hash
    on custkey is the honest plan; AQE picks it locally."""
    cust = tables.load(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (tables.load(spark, sf_dir, "orders")
                .where(F.col("o_orderpriority") == "1-URGENT")
                .groupBy("o_custkey").agg(F.count("*").alias("cnt")))
    return (cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
            .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
            .groupBy("c_count").agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register("q15_top_supplier", oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 class: supplier(s) achieving the quarter's max
    revenue — an aggregate reused twice (per-key totals + global max).

    The revenue agg is computed once; the scalar max comes back as a
    broadcast 1-row crossJoin (no .collect(), no second scan of
    lineitem — Spark reuses the shuffle output for both consumers).
    Ties are exact because both engines compare the same rounded
    value."""
    li = tables.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) &
        (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
             .agg(F.sum(_volume().cast("decimal(18,4)")).alias("total_revenue")))
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    sup = tables.load(spark, sf_dir, "supplier")
    return (rev.crossJoin(F.broadcast(top))
               .where(F.col("total_revenue") == F.col("max_rev"))
               .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
               .select("s_suppkey", "s_name",
                       F.col("total_revenue").cast("double")
                        .alias("total_revenue"))
               .orderBy("s_suppkey"))


@register("q17_small_qty_revenue", oracle="""
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
""")
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 class: revenue from below-average-quantity orders of
    one brand — a correlated scalar subquery decorrelated into a
    per-key aggregate + join.

    Quantities are integer-valued doubles, so per-part sums are exact
    in FP regardless of accumulation order and the 0.2*avg threshold
    is bit-identical across engines — no rounding needed at the
    comparison. part is brand-filtered then broadcast twice (filter +
    threshold side); the per-part avg groupBy is the only shuffle.
    Decorrelation trick: because brand is a part attribute, the
    per-part average over brand-filtered rows equals the average over
    all of lineitem, so we compute it on the already-pruned side."""
    part = tables.load(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#3").select("p_partkey")
    li = (tables.load(spark, sf_dir, "lineitem")
          .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")))
    thr = (li.groupBy("l_partkey")
             .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr"))
             .withColumnRenamed("l_partkey", "t_partkey"))
    return (li.join(F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey"))
              .where(F.col("l_quantity") < F.col("qty_thr"))
              .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                            .cast("double") / 7.0, 2).alias("avg_yearly")))


@register("q21_solo_returner", oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""")
def q21_solo_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 class (receiptdate/commitdate absent, so 'kept the
    order waiting' becomes 'was the only supplier to return'): EXISTS
    + NOT EXISTS against the same fact table, the classic double
    semi/anti self-join.

    All three lineitem legs hash-partition on l_orderkey — one
    exchange each, co-partitioned joins after. supplier x nation
    collapses to a broadcast map; the NATION_3 + returnflag filters
    prune l1 before the self-joins."""
    nat = tables.load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    sup = (tables.load(spark, sf_dir, "supplier")
           .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_name"))
    orders = tables.load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F").select("o_orderkey")
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag")
    l1 = (li.where(F.col("l_returnflag") == "R")
            .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")))
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = (li.where(F.col("l_returnflag") == "R")
            .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")))
    return (l1.join(l2, (F.col("l_orderkey") == F.col("o2")) &
                        (F.col("l_suppkey") != F.col("s2")), "left_semi")
              .join(l3, (F.col("l_orderkey") == F.col("o3")) &
                        (F.col("l_suppkey") != F.col("s3")), "left_anti")
              .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
              .groupBy("s_name").agg(F.count("*").alias("numwait"))
              .orderBy(F.col("numwait").desc(), F.col("s_name"))
              .limit(10))


@register("q22_idle_customers", oracle="""
SELECT cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (SELECT c_custkey % 7 AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                                        AS DOUBLE) / count(*), 2)
                         FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01')) AS custsale
GROUP BY cntrycode
ORDER BY cntrycode
""")
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 class (no phone column, so country code becomes a
    custkey bucket): rich customers with no recent orders — an
    uncorrelated scalar threshold + anti-join.

    The threshold is a 1-row aggregate attached by broadcast
    crossJoin (driver never collects). The avg is rounded to cents on
    BOTH engines so accumulation order can't move the cut line. The
    anti-join's right side is date-pruned at the parquet scan before
    it shuffles."""
    cust = tables.load(spark, sf_dir, "customer")
    thr = (cust.where(F.col("c_acctbal") > 0.0)
               .agg(F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                            .cast("double") / F.count("*"), 2).alias("bal_thr")))
    recent = (tables.load(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
              .select("o_custkey"))
    return (cust.crossJoin(F.broadcast(thr))
                .where(F.col("c_acctbal") > F.col("bal_thr"))
                .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
                .select((F.col("c_custkey") % 7).alias("cntrycode"), "c_acctbal")
                .groupBy("cntrycode")
                .agg(F.count("*").alias("numcust"),
                     F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                      .cast("double").alias("totacctbal"))
                .orderBy("cntrycode"))
