"""Approximate-cardinality sketches: HyperLogLog and KMV (k minimum
values) distinct-count estimators as deterministic cross-engine
operators.

Reference surface: Elasticsearch's `cardinality` aggregation is an
HLL++ sketch (the ES docs the reference stack's users hold: "the
cardinality aggregation ... based on the HyperLogLog++ algorithm");
Theta/KMV sketches are the same contract in the Druid/DataSketches
ecosystem. Spark's own `approx_count_distinct` is HLL too, but its
register layout is engine-private — so these operators implement the
sketch math explicitly from the repo's md5-based hash (identical hex
in Spark and DuckDB), making the estimate itself reproducible
bit-for-bit across engines and therefore hash-checkable by the
correctness driver, not just "approximately right".

Scale shape (HLL): one corpus scan computes (group, bucket, rho) as
pure map-side column math; groupBy(group, bucket) max(rho) is a
partial-aggregating shuffle of at most |groups|·m register rows; the
final per-group fold is over m=256 rows. At 100 TB the shuffle moves
registers, not rows — the whole point of a sketch. The register
harmonic sum is kept in EXACT integer form (sum of 2^(53-rho) as
BIGINT) so the result is independent of partitioning/merge order —
floating-point register sums would make the estimate depend on
aggregation order and break both determinism and the oracle compare.

Scale shape (KMV): dense_rank<=k over (group, hash) compiles with a
WindowGroupLimit below the exchange (Spark 3.5+): every map partition
pre-prunes to its k smallest hashes per group BEFORE the shuffle, so
the window shuffle moves O(groups·k) rows at any corpus size.

Mergeability (the property that makes sketches useful on a cluster)
is pinned in tests/test_sketches.py: registers built on two disjoint
halves of the corpus merge by max() into exactly the global registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..functions.hashing import md5_int60
from ..registry import register

HLL_M = 256          # registers (p = 8)
HLL_WBITS = 52       # 60-bit hash = 8 bucket bits + 52 rho bits
_W_MASK = (1 << HLL_WBITS) - 1
_POW53 = float(1 << (HLL_WBITS + 1))   # 2^53, exact in double
# alpha_m for m=256, spelled as the same literal arithmetic on both
# engines (*, / are IEEE-correctly-rounded, so the doubles agree)
_ALPHA_SQL = "0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0)"

KMV_K = 64
_POW60 = float(1 << 60)  # 2^60 as double, exact (power of two)


def hll_registers(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, bucket, rho) -> max(rho): the HLL register table.
    bucket = top 8 bits of the 60-bit md5 hash; rho = 1-indexed
    position of the first 1-bit in the remaining 52 (53 if all-zero).
    Integer-only (bit length via bin()-string length — no float log2,
    whose libm rounding could differ between engines)."""
    return (hll_project(df, group_col, value_col)
            .groupBy("grp", "bucket")
            .agg(F.max("rho").alias("m_j")))


def hll_project(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The map-side (grp, bucket, rho) projection — shared by the
    batch register builder and the streaming register maintainer
    (streaming/ingest.stream_cardinality_hll), where the same
    groupBy-max becomes a stateful streaming aggregation."""
    h = md5_int60(F.col(value_col).cast("string"))
    w = h.bitwiseAND(F.lit(_W_MASK))
    rho = F.when(w == 0, F.lit(HLL_WBITS + 1)) \
           .otherwise(F.lit(HLL_WBITS + 1) - F.length(F.bin(w)))
    return df.select(F.col(group_col).alias("grp"),
                     F.shiftright(h, HLL_WBITS).alias("bucket"),
                     rho.alias("rho"))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Fold registers to the raw HLL estimate. The harmonic sum
    sum_j 2^-M_j is scaled by 2^53 into an exact BIGINT (absent
    buckets are register value 0, contributing 2^53 each), so the
    only floating-point step is the final alpha·m²·2^53/S division —
    identical in both engines."""
    s_present = F.sum(F.expr("shiftleft(1L, 53 - m_j)"))
    n_present = F.count("*")
    folded = (regs.groupBy("grp")
                  .agg((s_present
                        + (F.lit(HLL_M) - n_present) * F.lit(1 << 53))
                       .alias("hll_s"),
                       (F.lit(HLL_M) - n_present).alias("v_zero")))
    raw = (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
           * F.lit(256.0) * F.lit(256.0) * F.lit(_POW53) / F.col("hll_s"))
    # small-range (linear counting) correction, as in Flajolet et al.:
    # below 2.5m the raw estimator is dominated by zero registers and
    # overestimates badly; m·ln(m/V) is the occupancy-based estimate.
    lc = F.lit(256.0) * F.log(F.lit(256.0) / F.col("v_zero"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (F.col("v_zero") > 0), lc) \
           .otherwise(raw)
    return folded.select("grp", "hll_s", F.round(est, 4).alias("hll_est"))


# Shared oracle CTE chain (hash → bucket/rho → registers → fold →
# raw estimate); composed by cardinality_hll below and the streaming
# register maintainer's oracle (streaming/ingest.py W7).
HLL_ORACLE_CTES = f"""
WITH h AS (
  SELECT event_type AS grp,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events),
b AS (
  SELECT grp, h >> {HLL_WBITS} AS bucket,
         CASE WHEN (h & {_W_MASK}) = 0 THEN {HLL_WBITS + 1}
              ELSE {HLL_WBITS + 1} - length(bin(h & {_W_MASK})) END AS rho
  FROM h),
regs AS (SELECT grp, bucket, max(rho) AS m_j FROM b GROUP BY 1, 2),
folded AS (
  SELECT grp,
         sum(1::BIGINT << (53 - m_j))::BIGINT
           + ({HLL_M} - count(*)) * (1::BIGINT << 53) AS hll_s,
         {HLL_M} - count(*) AS v_zero
  FROM regs GROUP BY 1),
est AS (
  SELECT grp, hll_s, v_zero,
         {_ALPHA_SQL} * 256.0e0 * 256.0e0 * {_POW53!r} / hll_s AS raw
  FROM folded)"""

HLL_ORACLE_EST = f"""round(CASE WHEN raw <= {2.5 * HLL_M!r}e0 AND v_zero > 0
                  THEN 256.0e0 * ln(256.0e0 / v_zero)
                  ELSE raw END, 4) AS hll_est"""


@register("cardinality_hll", oracle=f"""
{HLL_ORACLE_CTES},
exact AS (SELECT event_type AS grp,
                 count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
SELECT est.grp AS event_type, hll_s,
       {HLL_ORACLE_EST},
       CAST(n_exact AS BIGINT) AS n_exact
FROM est JOIN exact USING (grp)
ORDER BY event_type
""")
def cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via an explicit HLL sketch
    (ES `cardinality` agg contract), alongside the exact count the
    driver can trust. The estimate is a pure function of the register
    table, so the SQL oracle reproduces it bit-for-bit."""
    ev = tables.load_parallel(spark, sf_dir, "events", "event_id")
    est = hll_estimate(hll_registers(ev, "event_type", "user_id"))
    exact = (ev.groupBy(F.col("event_type").alias("grp"))
               .agg(F.countDistinct("user_id").cast("long").alias("n_exact")))
    return (est.join(exact, "grp")
               .select(F.col("grp").alias("event_type"),
                       "hll_s", "hll_est", "n_exact")
               .orderBy("event_type"))


@register("distinct_kmv", oracle=f"""
WITH h AS (
  SELECT event_type AS grp,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events),
r AS (SELECT grp, h, dense_rank() OVER (PARTITION BY grp ORDER BY h) AS dr
      FROM h),
kept AS (SELECT grp, h, dr FROM r WHERE dr <= {KMV_K}),
agg AS (SELECT grp, max(dr) AS nd, max(h) AS hk FROM kept GROUP BY 1)
SELECT grp AS event_type, CAST(nd AS BIGINT) AS sketch_size,
       round(CASE WHEN nd < {KMV_K} THEN nd::DOUBLE
                  ELSE ({KMV_K} - 1) * {_POW60!r} / hk END, 4) AS kmv_est
FROM agg ORDER BY event_type
""")
def distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values / bottom-k Theta) distinct sketch:
    keep the k smallest distinct hashes per group; the k-th smallest
    estimates the density, est = (k-1)·2^60/h_k. dense_rank de-dups
    hash collisions in-window, so no separate DISTINCT shuffle; the
    WindowGroupLimit rewrite keeps the shuffle at O(groups·k)."""
    ev = tables.load_parallel(spark, sf_dir, "events", "event_id")
    h = md5_int60(F.col("user_id").cast("string"))
    w = W.partitionBy("grp").orderBy("h")
    kept = (ev.select(F.col("event_type").alias("grp"), h.alias("h"))
              .withColumn("dr", F.dense_rank().over(w))
              .where(F.col("dr") <= KMV_K))
    est = F.when(F.col("nd") < KMV_K, F.col("nd").cast("double")) \
           .otherwise(F.lit(float(KMV_K - 1)) * F.lit(_POW60)
                      / F.col("hk"))
    return (kept.groupBy("grp")
                .agg(F.max("dr").alias("nd"), F.max("h").alias("hk"))
                .select(F.col("grp").alias("event_type"),
                        F.col("nd").cast("long").alias("sketch_size"),
                        F.round(est, 4).alias("kmv_est"))
                .orderBy("event_type"))


# --------------------------------------------------- Bloom filter sketch

BLOOM_M = 1 << 14   # filter bits
BLOOM_K = 4         # hash functions
BLOOM_PROBE_MOD = 97


def _bloom_hash_sql(s: str, i: int) -> str:
    return (f"(('0x' || substr(md5({s} || '#{i}'), 1, 15))::BIGINT"
            f" % {BLOOM_M})")


def _bloom_bits_sql(s: str) -> str:
    return "[" + ", ".join(_bloom_hash_sql(s, i)
                           for i in range(BLOOM_K)) + "]"


@register("bloom_membership", oracle=f"""
WITH bits AS (
  SELECT DISTINCT unnest({_bloom_bits_sql('text')}) AS bit
  FROM documents),
probes AS (
  SELECT doc_id, 'a_member' AS kind, text AS probe FROM documents
  WHERE doc_id % {BLOOM_PROBE_MOD} = 0
  UNION ALL
  SELECT doc_id, 'b_altered', text || '?' FROM documents
  WHERE doc_id % {BLOOM_PROBE_MOD} = 0),
pb AS (
  SELECT doc_id, kind, unnest({_bloom_bits_sql('probe')}) AS bit
  FROM probes),
hit AS (
  SELECT pb.doc_id, pb.kind,
         count(DISTINCT pb.bit) AS n_bits,
         count(DISTINCT CASE WHEN bits.bit IS NOT NULL
                             THEN pb.bit END) AS n_set
  FROM pb LEFT JOIN bits ON pb.bit = bits.bit
  GROUP BY 1, 2)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(count(CASE WHEN n_set = n_bits THEN 1 END) AS BIGINT)
         AS n_positive
FROM hit GROUP BY kind ORDER BY kind
""")
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch (the at-scale decontamination /
    "have we seen this document" primitive when the reference set is
    too big to broadcast exactly): k={BLOOM_K} md5-derived hash
    functions over m={BLOOM_M} bits; build = one distinct-bit pass
    (the bitmap is ≤ m rows — MBs at any corpus size, and bitmaps
    MERGE by union, so per-partition filters combine like HLL
    registers); probe = every distinct probe bit set (k-of-k modulo
    own-hash collisions, so a colliding member can never read as
    absent). The census probes every
    1-in-{BLOOM_PROBE_MOD} document as itself (must always hit: a
    Bloom filter has NO false negatives — pinned in tests) and as an
    altered twin (hits are the measured false-positive rate).

    Exact integer bit math end to end — positions, the distinct
    union, and the k-of-k test are engine-identical."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")

    def bloom_bits(col):
        return F.array(*[
            md5_int60(F.concat(col, F.lit(f"#{i}"))) % BLOOM_M
            for i in range(BLOOM_K)])

    bits = (docs.select(F.explode(bloom_bits(F.col("text"))).alias("bit"))
                .distinct())
    base = docs.where(F.col("doc_id") % BLOOM_PROBE_MOD == 0)
    # both probe kinds fan out of ONE pruned scan (a union of two
    # selects over `base` would read the parquet twice)
    probes = (base.select("doc_id", F.explode(F.array(
                  F.struct(F.lit("a_member").alias("kind"),
                           F.col("text").alias("probe")),
                  F.struct(F.lit("b_altered").alias("kind"),
                           F.concat("text", F.lit("?")).alias("probe"))))
                  .alias("s"))
              .select("doc_id", "s.kind", "s.probe"))
    pb = probes.select("doc_id", "kind",
                       F.explode(bloom_bits(F.col("probe"))).alias("bit"))
    hit = (pb.join(F.broadcast(bits.withColumn("set", F.lit(1))),
                   "bit", "left")
             .groupBy("doc_id", "kind")
             .agg(F.count_distinct("bit").alias("n_bits"),
                  F.count_distinct(F.when(F.col("set") == 1,
                                          F.col("bit"))).alias("n_set")))
    return (hit.groupBy("kind")
               .agg(F.count("*").cast("long").alias("n_queries"),
                    F.count(F.when(F.col("n_set") == F.col("n_bits"), 1))
                     .cast("long").alias("n_positive"))
               .orderBy("kind"))


# ----------------------------------------------------- Count-Min sketch

CM_D = 4        # hash rows
CM_W = 1024     # counters per row
CM_TERMS = ("vector", "scan", "merge", "slow", "key")
_CM_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in CM_TERMS) + ")"


def _cm_col_sql(s: str, i: int) -> str:
    return (f"(('0x' || substr(md5({s} || '#cm{i}'), 1, 15))::BIGINT"
            f" % {CM_W})")


ORACLES_CM = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(trim(text), ' '),
                            t -> t <> '')) AS term
  FROM documents),
cells AS (
  SELECT r, col, count(*) AS c FROM (
    {" UNION ALL ".join(
        f"SELECT {i} AS r, {_cm_col_sql('term', i)} AS col FROM tok"
        for i in range(CM_D))})
  GROUP BY 1, 2),
q(term) AS (VALUES {", ".join(f"('{t}')" for t in CM_TERMS)}),
qc AS (
  {" UNION ALL ".join(
      f"SELECT term, {i} AS r, {_cm_col_sql('term', i)} AS col FROM q"
      for i in range(CM_D))}),
probe AS (
  SELECT qc.term, coalesce(cells.c, 0) AS c
  FROM qc LEFT JOIN cells ON qc.r = cells.r AND qc.col = cells.col),
est AS (SELECT term, min(c) AS cms_est FROM probe GROUP BY 1),
ex AS (SELECT term, count(*) AS exact FROM tok
       WHERE term IN {_CM_TERMS_SQL} GROUP BY 1)
SELECT est.term, CAST(coalesce(ex.exact, 0) AS BIGINT) AS exact,
       CAST(est.cms_est AS BIGINT) AS cms_est
FROM est LEFT JOIN ex USING (term)
ORDER BY term
"""


def cm_col(col, i: int) -> F.Column:
    """Counter column of hash row i — THE ladder both the batch sketch
    and the streaming twin must share bit-for-bit."""
    return md5_int60(F.concat(col, F.lit(f"#cm{i}"))) % CM_W


def cm_cells(tok: DataFrame) -> DataFrame:
    """(r, col, c) counter cells from a (term) frame — works on batch
    AND streaming inputs (the groupBy is the only stateful step)."""
    return (tok.select(F.explode(F.array(*[
                F.struct(F.lit(i).alias("r"),
                         cm_col(F.col("term"), i).alias("col"))
                for i in range(CM_D)])).alias("rc"))
               .groupBy("rc.r", "rc.col")
               .agg(F.count("*").alias("c")))


def cm_estimate(spark: SparkSession, cells: DataFrame,
                terms: tuple[str, ...] = CM_TERMS) -> DataFrame:
    """Point estimates for `terms`: min over the d counters, where an
    UNTOUCHED cell counts 0 (probes LEFT-join the cells — an
    absent-from-corpus term must report estimate 0, not vanish)."""
    q = spark.createDataFrame([(t,) for t in terms], "term string")
    qcells = (q.select("term", F.explode(F.array(*[
                F.struct(F.lit(i).alias("r"),
                         cm_col(F.col("term"), i).alias("col"))
                for i in range(CM_D)])).alias("rc"))
               .select("term", "rc.r", "rc.col"))
    return (qcells.join(F.broadcast(cells), ["r", "col"], "left")
                  .groupBy("term")
                  .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                        .alias("cms_est")))


@register("countmin_term_freq", oracle=ORACLES_CM)
def countmin_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (Cormode & Muthukrishnan
    2005) — the heavy-hitter / term-frequency primitive when exact
    per-key counts can't be held: d x w integer counters, point
    estimate = min over rows. Counters ADD, so per-partition sketches
    merge exactly (the partial agg IS the merge — like HLL registers,
    only d·w cells ever cross the shuffle, never the key set), and
    estimates are exact-integer math: engine-identical and
    overestimates-only (est ≥ exact, pinned in tests).

    The census probes {len(CM_TERMS)} query terms and reports
    exact vs estimated counts — the collision inflation IS the
    measurement."""
    from ..functions.text import exploded_tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    tok = exploded_tokens(docs, "doc_id", "text") \
        .select(F.col("token").alias("term"))
    # ONE corpus pass for BOTH the d×w counters and the exact probe
    # counts (was two full tokenize passes — the r6 bench hotspot):
    # each token emits its d cell structs plus, when it IS one of the
    # |CM_TERMS| literal probe terms, a tagged (r=CM_D, col=term_idx)
    # struct; a single groupBy then counts everything, and the split
    # reads the CHECKPOINTED ≤(d·w+|terms|)-row result — bounded at
    # any corpus size, unlike checkpointing the token stream.
    cells_arr = F.array(*[
        F.struct(F.lit(i).alias("r"),
                 cm_col(F.col("term"), i).alias("col"))
        for i in range(CM_D)])
    probe_tag = None
    for ti, t in enumerate(CM_TERMS):
        branch = F.array(F.struct(
            F.lit(CM_D).alias("r"), F.lit(ti).cast("bigint").alias("col")))
        probe_tag = (F.when(F.col("term") == t, branch) if probe_tag is None
                     else probe_tag.when(F.col("term") == t, branch))
    probe_tag = probe_tag.otherwise(F.slice(branch, 1, 0))
    agg = (tok.select(F.explode(F.concat(cells_arr, probe_tag)).alias("rc"))
              .groupBy("rc.r", "rc.col")
              .agg(F.count("*").alias("c"))
              .localCheckpoint(eager=False))
    est = cm_estimate(spark, agg.where(F.col("r") < CM_D))
    terms = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CM_TERMS)], "col long, term string")
    ex = (agg.where(F.col("r") == CM_D)
             .join(terms, "col")
             .select("term", F.col("c").alias("exact")))
    return (est.join(ex, "term", "left")
               .select("term",
                       F.coalesce(F.col("exact"), F.lit(0))
                        .cast("long").alias("exact"),
                       F.col("cms_est").cast("long").alias("cms_est"))
               .orderBy("term"))
