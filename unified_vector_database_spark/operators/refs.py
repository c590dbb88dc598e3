"""Weaviate cross-reference surface: filtering through reference
paths and resolving referenced properties into the result — the
graph-flavored query shape Weaviate layers over its object store
(`Get` with a `where` filter whose `path` walks `inNation` →
`inRegion`, and a return set that expands the referenced objects'
properties).

Reference parity: the weaviate backend (/root/reference README.md
`VECTOR_DB=weaviate`) models relations as cross-references between
classes; a beacon is a foreign key. A 2-hop path filter is exactly a
customer→nation→region join chain with the predicate on the far
end, and property resolution is the join's projection. Qdrant spells
the 1-hop version `lookup_from` (already covered by
recommend_lookup_from); this is the multi-hop filter form.

Scale shape: both reference targets are DIMENSION tables (25
nations, 5 regions) — broadcast hash joins with zero shuffle on the
fact side; the far-end predicate prunes the broadcast build side
before it ships. TakeOrdered pages the top-k. At 100 TB the object
table streams map-side through two tiny broadcasts — the plan a
graph walk compiles to when the referenced classes are small, which
reference metadata classes are by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..registry import register

REF_REGION = "ASIA"
REF_MIN_BAL = 5000.0
REF_PAGE = 20


@register("crossref_2hop_filter", oracle=f"""
SELECT c.c_custkey, c.c_name,
       n.n_name AS nation, r.r_name AS region,
       CAST(c.c_acctbal AS DOUBLE) AS acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{REF_REGION}' AND c.c_acctbal > {REF_MIN_BAL!r}
ORDER BY c.c_custkey
LIMIT {REF_PAGE}
""")
def crossref_2hop_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weaviate `Get` with a 2-hop cross-reference path filter:
    customers whose `inNation` → `inRegion` reference chain lands on
    region '{REF_REGION}' and whose own `acctbal` exceeds
    {REF_MIN_BAL}, returning the object plus the RESOLVED reference
    properties (nation and region names — the `inNation {{ name,
    inRegion {{ name }} }}` return expansion), first {REF_PAGE} by
    id.

    Scale shape: region filters FIRST (the far end of the path), the
    pruned region broadcast-joins nation, and that ≤|nations| frame
    broadcasts onto the customer scan — the fact table never
    shuffles; its own predicate pushes into the parquet scan.
    TakeOrdered pages."""
    cust = tables.load(spark, sf_dir, "customer")
    nat = tables.load(spark, sf_dir, "nation")
    reg = (tables.load(spark, sf_dir, "region")
           .where(F.col("r_name") == REF_REGION))
    hop = (nat.join(F.broadcast(reg),
                    nat.n_regionkey == reg.r_regionkey)
              .select("n_nationkey", F.col("n_name").alias("nation"),
                      F.col("r_name").alias("region")))
    return (cust.where(F.col("c_acctbal") > REF_MIN_BAL)
                .join(F.broadcast(hop),
                      cust.c_nationkey == hop.n_nationkey)
                .select("c_custkey", "c_name", "nation", "region",
                        F.col("c_acctbal").cast("double")
                         .alias("acctbal"))
                .orderBy("c_custkey")
                .limit(REF_PAGE))
