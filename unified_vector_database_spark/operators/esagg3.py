"""ES aggregation surface, r5 wave: `filters` (named predicate
buckets + other), `significant_terms` (keyword-field significance),
`ip_prefix`, and `geohash_grid`.

Reference parity: named aggregation types of the reference stack's
Elasticsearch backend (README.md:82 `VECTOR_DB=elastic`); geohash
cells are also the bucketing Qdrant/ES geo facets page on.

Scale shapes: every one is a single partial-agg scan whose bucket
label (CASE / JLH flag / prefix mask / geohash) is computed map-side;
output cardinality is bucket-count-, source-count-, prefix-count- or
cell-count-sized — never corpus-sized. The geohash encode is pure
integer bit math (no UDF): both engines derive the cell key from the
same IEEE doubles, so cell assignment is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..registry import register
from .esagg2 import _ip_sql
from .geo import with_coords

# -------------------------------------------------------------- filters agg

FILTERS_VALUE_MIN = 90.0


@register("filters_agg", oracle=f"""
WITH a AS (
  SELECT
    count(CASE WHEN event_type = 'click' THEN 1 END) AS n1,
    CAST(sum(CASE WHEN event_type = 'click'
             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS v1,
    count(CASE WHEN value > {FILTERS_VALUE_MIN!r} THEN 1 END) AS n2,
    CAST(sum(CASE WHEN value > {FILTERS_VALUE_MIN!r}
             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS v2,
    count(CASE WHEN event_type <> 'click'
               AND value <= {FILTERS_VALUE_MIN!r} THEN 1 END) AS n3,
    CAST(sum(CASE WHEN event_type <> 'click'
                  AND value <= {FILTERS_VALUE_MIN!r}
             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS v3
  FROM events)
SELECT 'a_clicks' AS bucket, CAST(n1 AS BIGINT) AS n, v1 AS total_value
FROM a
UNION ALL SELECT 'b_high_value', CAST(n2 AS BIGINT), v2 FROM a
UNION ALL SELECT 'c_other', CAST(n3 AS BIGINT), v3 FROM a
ORDER BY bucket
""")
def filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `filters` agg with `other_bucket`: independent NAMED
    predicate buckets (a row may match several — unlike a terms
    partition) plus the matches-none bucket. ONE scan computes every
    bucket as a conditional aggregate (map-side CASE, partial-agg'd);
    the 1-row wide result unpivots to (bucket, n, total) rows via
    stack — 3-row output, no second pass."""
    ev = tables.load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    is_click = F.col("event_type") == "click"
    is_high = F.col("value") > FILTERS_VALUE_MIN
    a = ev.agg(
        F.count(F.when(is_click, 1)).alias("n1"),
        F.sum(F.when(is_click, dec)).cast("double").alias("v1"),
        F.count(F.when(is_high, 1)).alias("n2"),
        F.sum(F.when(is_high, dec)).cast("double").alias("v2"),
        F.count(F.when(~is_click & ~is_high, 1)).alias("n3"),
        F.sum(F.when(~is_click & ~is_high, dec)).cast("double").alias("v3"))
    return (a.selectExpr(
                "stack(3, 'a_clicks', n1, v1, 'b_high_value', n2, v2, "
                "'c_other', n3, v3) AS (bucket, n, total_value)")
             .orderBy("bucket"))


# ------------------------------------------------------- significant_terms

SIGTERMS_LANG = "en"


@register("significant_terms_agg", oracle=f"""
WITH tot AS (
  SELECT count(CASE WHEN lang = '{SIGTERMS_LANG}' THEN 1 END) AS nfg,
         count(*) AS nall
  FROM documents),
tc AS (
  SELECT source,
         count(CASE WHEN lang = '{SIGTERMS_LANG}' THEN 1 END) AS fg_docs,
         count(*) AS all_docs
  FROM documents GROUP BY source)
SELECT source, CAST(fg_docs AS BIGINT) AS fg_docs,
       CAST(all_docs AS BIGINT) AS all_docs,
       round((fg_docs * 1.0 / nfg - all_docs * 1.0 / nall)
             * (fg_docs * 1.0 / nfg) / (all_docs * 1.0 / nall), 6)
         AS jlh_score
FROM tc CROSS JOIN tot
WHERE fg_docs > 0
ORDER BY jlh_score DESC, source LIMIT 10
""")
def significant_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `significant_terms` on a KEYWORD field — distinct from the
    free-text forms (T10 `significant_terms`: token lift; T41
    `significant_text_agg`: token JLH): the bucket key is a
    structured field value, so there is no tokenize/explode at all —
    one groupBy(source) with a conditional foreground count, totals
    broadcast. Foreground = lang='{SIGTERMS_LANG}' docs, JLH-scored
    (ES's default significance heuristic)."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    fg = F.col("lang") == SIGTERMS_LANG
    tot = docs.agg(F.count(F.when(fg, 1)).alias("nfg"),
                   F.count("*").alias("nall"))
    tc = docs.groupBy("source").agg(
        F.count(F.when(fg, 1)).alias("fg_docs"),
        F.count("*").alias("all_docs"))
    fgp = F.col("fg_docs") / F.col("nfg")
    bgp = F.col("all_docs") / F.col("nall")
    return (tc.crossJoin(F.broadcast(tot))
              .where(F.col("fg_docs") > 0)
              .select("source",
                      F.col("fg_docs").cast("long").alias("fg_docs"),
                      F.col("all_docs").cast("long").alias("all_docs"),
                      F.round((fgp - bgp) * fgp / bgp, 6).alias("jlh_score"))
              .orderBy(F.desc("jlh_score"), "source").limit(10))


# ------------------------------------------------------------- ip_prefix

IP_PREFIX_LEN = 28  # /28 -> 16-address blocks


@register("ip_prefix_agg", oracle=f"""
WITH ips AS (SELECT {_ip_sql()} AS ip FROM events),
parsed AS (
  SELECT ip,
         CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
       + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
       + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
       + CAST(string_split(ip, '.')[4] AS BIGINT) AS addr
  FROM ips),
net AS (SELECT ip, addr - (addr % 16) AS net FROM parsed)
SELECT concat(CAST(net // 16777216 % 256 AS VARCHAR), '.',
              CAST(net // 65536 % 256 AS VARCHAR), '.',
              CAST(net // 256 % 256 AS VARCHAR), '.',
              CAST(net % 256 AS VARCHAR), '/{IP_PREFIX_LEN}') AS prefix,
       count(*) AS n,
       CAST(count(DISTINCT ip) AS BIGINT) AS n_ips
FROM net GROUP BY 1 ORDER BY 1
""")
def ip_prefix_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `ip_prefix` agg: dotted-quad addresses bucketed by their
    /{IP_PREFIX_LEN} network prefix — parse (octet weights), mask
    (addr - addr % 2^(32-len)), and key re-rendering are all map-side
    integer/string builtins; bucket cardinality = live prefixes."""
    ev = tables.load(spark, sf_dir, "events")
    ip = F.concat(F.lit("10."),
                  (F.col("user_id") / 65536).cast("long") % 256, F.lit("."),
                  (F.col("user_id") / 256).cast("long") % 256, F.lit("."),
                  F.col("user_id") % 256)
    parts = F.split("ip", r"\.")
    addr = (F.element_at(parts, 1).cast("long") * 16777216
            + F.element_at(parts, 2).cast("long") * 65536
            + F.element_at(parts, 3).cast("long") * 256
            + F.element_at(parts, 4).cast("long"))
    block = 1 << (32 - IP_PREFIX_LEN)
    p = (ev.select(ip.alias("ip")).withColumn("addr", addr)
           .withColumn("net", F.col("addr") - F.col("addr") % block))
    prefix = F.concat(
        (F.col("net") / 16777216).cast("long") % 256, F.lit("."),
        (F.col("net") / 65536).cast("long") % 256, F.lit("."),
        (F.col("net") / 256).cast("long") % 256, F.lit("."),
        F.col("net") % 256, F.lit(f"/{IP_PREFIX_LEN}"))
    return (p.groupBy(prefix.alias("prefix"))
             .agg(F.count("*").alias("n"),
                  F.countDistinct("ip").cast("long").alias("n_ips"))
             .orderBy("prefix"))


# ----------------------------------------------------------- geohash_grid

GEOHASH_PRECISION = 4          # 4 base-32 chars = 20 bits (10 lon, 10 lat)
_GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 10                  # per axis


def _gh_interleave_sql(lon_int: str, lat_int: str) -> str:
    """Bit-interleave (lon first, geohash convention) as a static sum
    of masked shifts — pure integer math, identical on both engines."""
    terms = []
    for i in range(_GH_BITS):
        terms.append(f"(({lon_int} // {1 << (_GH_BITS - 1 - i)}) % 2) "
                     f"* {1 << (19 - 2 * i)}")
        terms.append(f"(({lat_int} // {1 << (_GH_BITS - 1 - i)}) % 2) "
                     f"* {1 << (18 - 2 * i)}")
    return " + ".join(terms)


def _gh_chars_sql(inter: str) -> str:
    return ("concat(" + ", ".join(
        f"substr('{_GH_ALPHA}', CAST(({inter}) // {1 << (15 - 5 * c)} "
        f"% 32 AS INT) + 1, 1)"
        for c in range(GEOHASH_PRECISION)) + ")")


@register("geohash_grid_agg", oracle=f"""
WITH g AS (
  SELECT c_custkey,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer),
q AS (
  SELECT c_custkey,
         least(CAST(floor((lat + 90.0) / 180.0 * 1024.0) AS BIGINT),
               1023) AS lat_i,
         least(CAST(floor((lon + 180.0) / 360.0 * 1024.0) AS BIGINT),
               1023) AS lon_i
  FROM g),
h AS (SELECT c_custkey, {_gh_interleave_sql('lon_i', 'lat_i')} AS inter
      FROM q)
SELECT {_gh_chars_sql('inter')} AS geohash, count(*) AS n
FROM h GROUP BY 1
ORDER BY n DESC, geohash LIMIT 20
""")
def geohash_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `geohash_grid` agg (precision {GEOHASH_PRECISION}): points
    bucketed by base-32 geohash cell. The encode is the real geohash
    algorithm in closed form — quantize each axis to {_GH_BITS} bits,
    interleave (lon first), render 5-bit groups through the base-32
    alphabet — as a static sum of masked shifts, all JVM integer
    math in the scan stage (no UDF, no loop). Both engines start
    from identical IEEE doubles, so cell assignment is bit-identical
    (for a point within ~1 ulp of a cell boundary the closed form may
    legally differ from exact interval bisection — a sub-picometer
    quantization convention shared by both engines; see
    tests/test_r5_props.py). Top cells by population, the standard
    map-facet page."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    lat_i = F.least(F.floor((F.col("lat") + 90.0) / 180.0 * 1024.0)
                    .cast("long"), F.lit(1023))
    lon_i = F.least(F.floor((F.col("lon") + 180.0) / 360.0 * 1024.0)
                    .cast("long"), F.lit(1023))
    q = cust.select("c_custkey", lat_i.alias("lat_i"), lon_i.alias("lon_i"))

    inter = None
    for i in range(_GH_BITS):
        t1 = (F.shiftright(F.col("lon_i"), _GH_BITS - 1 - i)
              .bitwiseAND(F.lit(1))) * (1 << (19 - 2 * i))
        t2 = (F.shiftright(F.col("lat_i"), _GH_BITS - 1 - i)
              .bitwiseAND(F.lit(1))) * (1 << (18 - 2 * i))
        inter = t1 + t2 if inter is None else inter + t1 + t2
    h = q.select("c_custkey", inter.alias("inter"))
    # F.substring needs a literal pos, so the 5-bit char lookups are
    # SQL-expr'd (still pure JVM builtins, codegen'd in the scan)
    gh = F.concat(*[
        F.expr(f"substr('{_GH_ALPHA}', "
               f"CAST(shiftright(inter, {15 - 5 * c}) & 31 AS INT) + 1, 1)")
        for c in range(GEOHASH_PRECISION)])
    return (h.select(gh.alias("geohash"))
             .groupBy("geohash").agg(F.count("*").alias("n"))
             .orderBy(F.desc("n"), "geohash").limit(20))


# ------------------------------------------------------------------ rate

RATE_UNIT_HOURS = 24.0  # day buckets normalized to a per-hour rate


@register("rate_agg", oracle=f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) AS n,
       round(count(*) / {RATE_UNIT_HOURS!r}, 6) AS events_per_hour,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / {RATE_UNIT_HOURS!r}, 6) AS value_per_hour
FROM events GROUP BY 1 ORDER BY 1
""")
def rate_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rate` agg inside a date_histogram: bucket sums normalized
    to a smaller calendar unit (day buckets → per-hour rate; ES
    divides by the bucket-to-unit ratio exactly like this). The
    normalization is constant column math over the bucket frame —
    same single-scan shape as every sibling pipeline agg."""
    ev = tables.load(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
              .agg(F.count("*").alias("n"),
                   F.round(F.count("*") / RATE_UNIT_HOURS, 6)
                    .alias("events_per_hour"),
                   F.round(F.sum(F.col("value").cast("decimal(18,2)"))
                            .cast("double") / RATE_UNIT_HOURS, 6)
                    .alias("value_per_hour"))
              .orderBy("day"))


@register("significant_terms_chi2", oracle=f"""
WITH tot AS (
  SELECT count(CASE WHEN lang = '{SIGTERMS_LANG}' THEN 1 END) AS nfg,
         count(*) AS nall
  FROM documents),
tc AS (
  SELECT source,
         count(CASE WHEN lang = '{SIGTERMS_LANG}' THEN 1 END) AS a,
         count(*) AS all_docs
  FROM documents GROUP BY source)
SELECT source, CAST(a AS BIGINT) AS fg_docs,
       CAST(all_docs AS BIGINT) AS all_docs,
       round(CAST(nall AS DOUBLE)
             * (CAST(a AS DOUBLE)
                  * (CAST(nall AS DOUBLE) - CAST(nfg AS DOUBLE)
                     - (CAST(all_docs AS DOUBLE) - CAST(a AS DOUBLE)))
                - (CAST(all_docs AS DOUBLE) - CAST(a AS DOUBLE))
                  * (CAST(nfg AS DOUBLE) - CAST(a AS DOUBLE)))
             * (CAST(a AS DOUBLE)
                  * (CAST(nall AS DOUBLE) - CAST(nfg AS DOUBLE)
                     - (CAST(all_docs AS DOUBLE) - CAST(a AS DOUBLE)))
                - (CAST(all_docs AS DOUBLE) - CAST(a AS DOUBLE))
                  * (CAST(nfg AS DOUBLE) - CAST(a AS DOUBLE)))
             / (CAST(all_docs AS DOUBLE)
                * (CAST(nall AS DOUBLE) - CAST(all_docs AS DOUBLE))
                * CAST(nfg AS DOUBLE)
                * (CAST(nall AS DOUBLE) - CAST(nfg AS DOUBLE))), 6)
         AS chi2_score
FROM tc CROSS JOIN tot
WHERE a > 0
ORDER BY chi2_score DESC, source LIMIT 10
""")
def significant_terms_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `significant_terms` with the `chi_square` heuristic — the
    third selectable significance score next to JLH
    (significant_terms_agg) and lift (T10): the textbook 2x2 chi²
    N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) over (in/out bucket) ×
    (fore/background). Same single-scan shape as the JLH form (one
    conditional groupBy + broadcast totals); all contingency counts
    are exact integers and both engines evaluate the identical
    double expression, so the score hashes despite the large
    products."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    fg = F.col("lang") == SIGTERMS_LANG
    tot = docs.agg(F.count(F.when(fg, 1)).alias("nfg"),
                   F.count("*").alias("nall"))
    tc = docs.groupBy("source").agg(
        F.count(F.when(fg, 1)).alias("a"),
        F.count("*").alias("all_docs"))
    a = F.col("a").cast("double")
    ad = F.col("all_docs").cast("double")
    nfg = F.col("nfg").cast("double")
    nall = F.col("nall").cast("double")
    b = ad - a            # in-bucket background
    c = nfg - a           # out-bucket foreground
    d = nall - nfg - b    # out-bucket background
    det = a * d - b * c
    chi2 = (nall * det * det
            / (ad * (nall - ad) * nfg * (nall - nfg)))
    return (tc.crossJoin(F.broadcast(tot))
              .where(F.col("a") > 0)
              .select("source",
                      F.col("a").cast("long").alias("fg_docs"),
                      F.col("all_docs").cast("long").alias("all_docs"),
                      F.round(chi2, 6).alias("chi2_score"))
              .orderBy(F.desc("chi2_score"), "source").limit(10))
