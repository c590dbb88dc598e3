"""ES aggregation surface, r6 wave: `geotile_grid` (Web-Mercator
slippy-map tiles — the OTHER geo grid next to esagg3's geohash),
`bucket_script` (per-bucket derived metric from sibling aggregates),
and `scripted_metric` (a custom order-dependent fold, demonstrated as
max-drawdown over the daily value series).

Reference parity: named aggregation types of the reference stack's
Elasticsearch backend (README.md:82 `VECTOR_DB=elastic`) —
`geotile_grid`, `bucket_script`, `scripted_metric`.

Scale shapes:
- geotile_grid: the tile key is computed map-side in the scan stage
  (pure column math, no UDF); one partial-agg shuffle of
  cell-count-sized buckets. Identical posture to geohash_grid.
- bucket_script: the sibling metrics are conditional aggregates of
  ONE scan (map-side CASE); the script runs on |days| bucket rows.
- scripted_metric: the fold is re-expressed as window algebra over
  the |type × day| bucket frame (running max → drawdown), so the
  "script" never sees raw events; partitions are bounded by the
  date span, and the bucket frame comes from one partial-agg scan.

Float determinism: tile x and the synthetic coordinates are pure
rational IEEE math (bit-identical across engines). Tile y needs
ln/tan/cos, where engines may legally differ by ~1 ulp — safe here
because the synthetic coordinate lattice keeps every y at least
4e-10 from a floor boundary (empirically verified over the full
lattice; the one exactly-integral case, lat=0 → y=32.0, is IEEE-exact
on every libm since tan(0)=0 and ln(1)=0 are mandated special
values). Bucket sums accumulate as exact DECIMAL; ratios divide
identical doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..registry import register
from .geo import with_coords

# ------------------------------------------------------------ geotile_grid

GEOTILE_ZOOM = 6
_GT_N = 1 << GEOTILE_ZOOM
# ES clamps latitude to the Web-Mercator domain with this constant
# (elasticsearch GeoTileUtils.LATITUDE_MASK).
GEOTILE_LAT_LIM = 85.05112878


@register("geotile_grid_agg", oracle=f"""
WITH g AS (
  SELECT c_custkey,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer),
c AS (
  SELECT c_custkey, lon,
         least(greatest(lat, -{GEOTILE_LAT_LIM!r}), {GEOTILE_LAT_LIM!r})
           AS latc
  FROM g),
t AS (
  SELECT
    least(greatest(CAST(floor((lon + 180.0) / 360.0 * {_GT_N}) AS BIGINT),
                   0), {_GT_N - 1}) AS xt,
    least(greatest(CAST(floor(
        (1.0 - ln(tan(radians(latc)) + 1.0 / cos(radians(latc)))
               / {math.pi!r}) / 2.0 * {_GT_N}) AS BIGINT),
                   0), {_GT_N - 1}) AS yt
  FROM c)
SELECT '{GEOTILE_ZOOM}/' || CAST(xt AS VARCHAR) || '/'
         || CAST(yt AS VARCHAR) AS tile,
       count(*) AS n
FROM t GROUP BY 1
ORDER BY n DESC, tile LIMIT 20
""")
def geotile_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `geotile_grid` agg (zoom 6): points bucketed by
    Web-Mercator slippy-map tile `z/x/y` — the projection-native grid
    next to geohash_grid's base-32 cells. x is pure rational math;
    y runs ln∘tan through the scan stage as JVM column math (no UDF)
    with the ES latitude clamp. Top tiles by population."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    latc = F.least(F.greatest(F.col("lat"), F.lit(-GEOTILE_LAT_LIM)),
                   F.lit(GEOTILE_LAT_LIM))
    rad = F.radians(latc)
    xt = F.least(F.greatest(
        F.floor((F.col("lon") + 180.0) / 360.0 * _GT_N).cast("long"),
        F.lit(0)), F.lit(_GT_N - 1))
    yt = F.least(F.greatest(
        F.floor((F.lit(1.0)
                 - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
                 / F.lit(math.pi)) / F.lit(2.0) * _GT_N).cast("long"),
        F.lit(0)), F.lit(_GT_N - 1))
    tile = F.concat(F.lit(f"{GEOTILE_ZOOM}/"), xt.cast("string"),
                    F.lit("/"), yt.cast("string"))
    return (cust.select(tile.alias("tile"))
                .groupBy("tile").agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "tile").limit(20))


# ----------------------------------------------------------- bucket_script

@register("bucket_script_agg", oracle="""
WITH b AS (
  SELECT date_trunc('day', ts)::DATE AS day,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         CAST(sum(CASE WHEN event_type = 'click'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
           AS click_value
  FROM events GROUP BY 1)
SELECT day, total_value,
       coalesce(click_value, 0.0e0) AS click_value,
       CASE WHEN total_value = 0 THEN NULL
            ELSE round(coalesce(click_value, 0.0e0) / total_value, 6)
       END AS click_share
FROM b ORDER BY day
""")
def bucket_script_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bucket_script` pipeline agg: a per-bucket derived metric
    computed FROM sibling aggregates (here click_value / total_value
    per day — the canonical ratio example from the ES docs). Both
    sibling metrics are conditional aggregates of one scan; the
    script itself costs |days| rows. Sums accumulate as exact
    DECIMAL; the ratio divides the identical doubles on both
    engines."""
    ev = tables.load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    b = (ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
           .agg(F.sum(dec).cast("double").alias("total_value"),
                F.sum(F.when(F.col("event_type") == "click", dec))
                 .cast("double").alias("click_value")))
    share = F.when(F.col("total_value") == 0, F.lit(None).cast("double")) \
             .otherwise(F.round(F.coalesce(F.col("click_value"), F.lit(0.0))
                                / F.col("total_value"), 6))
    return (b.select("day", "total_value",
                     F.coalesce(F.col("click_value"), F.lit(0.0))
                      .alias("click_value"),
                     share.alias("click_share"))
             .orderBy("day"))


# --------------------------------------------------------- scripted_metric

@register("scripted_metric_agg", oracle="""
WITH d AS (
  SELECT event_type, date_trunc('day', ts)::DATE AS day,
         sum(CAST(value AS DECIMAL(18,2))) AS total
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, day, total,
         max(total) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS peak
  FROM d)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(max(peak) AS DOUBLE) AS peak_value,
       CAST(max(peak - total) AS DOUBLE) AS max_drawdown
FROM r GROUP BY 1 ORDER BY event_type
""")
def scripted_metric_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `scripted_metric` agg: a custom ORDER-DEPENDENT fold that no
    built-in agg expresses — max drawdown of the per-type daily value
    series (largest peak-to-trough drop). The map/combine/reduce
    script is re-expressed as window algebra over the bucket frame:
    running peak per event_type, then one more partial agg. Raw
    events are touched exactly once (the day-bucket partial agg);
    the windows run over |types × days| rows with bounded
    partitions. Daily totals, peaks, and diffs all stay in exact
    DECIMAL until the final DOUBLE cast, so the fold is
    merge-order-free on both engines."""
    ev = tables.load(spark, sf_dir, "events")
    d = (ev.groupBy(F.col("event_type"),
                    F.date_trunc("day", "ts").cast("date").alias("day"))
           .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("total")))
    w = (W.partitionBy("event_type").orderBy("day")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    r = d.withColumn("peak", F.max("total").over(w))
    return (r.groupBy("event_type")
             .agg(F.count("*").cast("long").alias("n_days"),
                  F.max("peak").cast("double").alias("peak_value"),
                  F.max(F.col("peak") - F.col("total")).cast("double")
                   .alias("max_drawdown"))
             .orderBy("event_type"))


# ------------------------------------------------------ bucket_correlation

@register("bucket_correlation_agg", oracle="""
WITH b AS (
  SELECT date_trunc('day', ts)::DATE AS day,
         CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
              AS BIGINT) AS x,
         sum(CAST(value AS DECIMAL(18,2))) AS y
  FROM events GROUP BY 1),
s AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
                       AS DECIMAL(38,4))) AS DOUBLE) AS syy,
         CAST(sum(CAST(x * CAST(y AS DOUBLE) AS DECIMAL(38,4)))
              AS DOUBLE) AS sxy
  FROM b)
SELECT CAST(n AS BIGINT) AS n_buckets,
       CASE WHEN n = 0
              OR sqrt(sxx / n - (sx / n) * (sx / n))
                 * sqrt(syy / n - (sy / n) * (sy / n)) = 0 THEN NULL
            ELSE round((sxy / n - (sx / n) * (sy / n))
                       / (sqrt(sxx / n - (sx / n) * (sx / n))
                          * sqrt(syy / n - (sy / n) * (sy / n))), 6)
       END AS correlation
FROM s
""")
def bucket_correlation_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bucket_correlation` pipeline agg (count_correlation
    function): Pearson correlation between a per-bucket metric series
    (daily click count) and a second series (daily total value).
    Both series come from ONE conditional-agg scan; the five power
    sums over the |days| bucket frame accumulate as exact
    BIGINT/DECIMAL (never the engines' own corr builtins, whose
    accumulation differs), and the closed-form Pearson divides
    identical doubles."""
    ev = tables.load(spark, sf_dir, "events")
    b = (ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
           .agg(F.count(F.when(F.col("event_type") == "click", 1))
                 .cast("long").alias("x"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("y")))
    yd = F.col("y").cast("double")
    s = b.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,4)")).cast("double").alias("syy"),
        F.sum((F.col("x") * yd).cast("decimal(38,4)")).cast("double")
         .alias("sxy"))
    n = F.col("n")
    denom = (F.sqrt(F.col("sxx") / n
                    - (F.col("sx") / n) * (F.col("sx") / n))
             * F.sqrt(F.col("syy") / n
                      - (F.col("sy") / n) * (F.col("sy") / n)))
    corr = ((F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n))
            / denom)
    # a flat series (or an empty one) has no correlation — NULL, not
    # a NaN from 0/0 (ANSI doubles do not throw, but NaN hashes
    # differently than SQL NULL)
    guarded = F.when((n == 0) | (denom == 0),
                     F.lit(None).cast("double"))                .otherwise(F.round(corr, 6))
    return s.select(n.cast("long").alias("n_buckets"),
                    guarded.alias("correlation"))


# -------------------------------------------------------- categorize_text

CATEGORIZE_SIG_TOKENS = 4
CATEGORIZE_TOP = 15


@register("categorize_text_agg", oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_transform(
           (list_filter(string_split(trim(text), ' '),
                        x -> x <> ''))[1:{CATEGORIZE_SIG_TOKENS}],
           x -> regexp_replace(x, '[0-9]+', '<n>', 'g')) AS sig_toks
  FROM documents),
g AS (SELECT array_to_string(sig_toks, ' ') AS category,
             count(*) AS n_docs, min(doc_id) AS example_doc
      FROM t GROUP BY 1)
SELECT category, CAST(n_docs AS BIGINT) AS n_docs, example_doc
FROM g ORDER BY n_docs DESC, category LIMIT {CATEGORIZE_TOP}
""")
def categorize_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `categorize_text` agg (log-message pattern clustering),
    deterministic core: each doc's category is its leading token
    signature with numeric runs normalized to `<n>` — the
    drain-style prefix bucketing that groups "error 404 on node 7"
    with "error 500 on node 12". Signature is pure map-side string
    math; one partial-agg groupBy whose cardinality is the pattern
    count, TakeOrdered top categories."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    sig = F.array_join(
        F.transform(F.slice(tokens("text"), 1, CATEGORIZE_SIG_TOKENS),
                    lambda x: F.regexp_replace(x, "[0-9]+", "<n>")),
        " ")
    return (docs.select("doc_id", sig.alias("category"))
                .groupBy("category")
                .agg(F.count("*").cast("long").alias("n_docs"),
                     F.min("doc_id").alias("example_doc"))
                .orderBy(F.desc("n_docs"), "category")
                .limit(CATEGORIZE_TOP))


# ---------------------------------------------------- terms partitioning

TERMS_NUM_PARTITIONS = 4
TERMS_PARTITION = 1


@register("terms_partition_agg", oracle=f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(trim(text), ' '),
                            t -> t <> '')) AS term
  FROM documents),
p AS (
  SELECT term, count(*) AS n FROM tok
  WHERE ('0x' || substr(md5(term), 1, 15))::BIGINT
          % {TERMS_NUM_PARTITIONS} = {TERMS_PARTITION}
  GROUP BY 1)
SELECT term, CAST(n AS BIGINT) AS n FROM p
ORDER BY n DESC, term LIMIT 25
""")
def terms_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg with `include.partition` / `num_partitions` — the
    paging lever for HUGE-cardinality key sets: each request
    aggregates only the terms hashing into one partition, so a 100M-
    key census pages through {TERMS_NUM_PARTITIONS} bounded responses
    instead of one unbounded one. The partition predicate lands
    map-side BEFORE the aggregate (only 1/{TERMS_NUM_PARTITIONS} of
    tokens shuffle), and the md5-derived partition assignment is
    engine-identical and stable across pages."""
    from ..functions.hashing import md5_int60
    from ..functions.text import exploded_tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    tok = exploded_tokens(docs, "doc_id", "text") \
        .select(F.col("token").alias("term"))
    part = md5_int60(F.col("term")) % TERMS_NUM_PARTITIONS
    return (tok.where(part == TERMS_PARTITION)
               .groupBy("term").agg(F.count("*").cast("long").alias("n"))
               .orderBy(F.desc("n"), "term").limit(25))


# ------------------------------------------------------------ search_mvt

MVT_Z = 1            # target tile zoom (the /{z}/{x}/{y} of the call)
MVT_GRID_BITS = 4    # grid_precision: cells are z+4 subtiles (16x16)
_MVT_FINE_Z = MVT_Z + MVT_GRID_BITS
_MVT_FINE_N = 1 << _MVT_FINE_Z


def _slippy_xy(lat: float, lon: float, z: int) -> tuple[int, int]:
    """Driver-side twin of the geotile cell math (query tile pick)."""
    n = 1 << z
    latc = min(max(lat, -GEOTILE_LAT_LIM), GEOTILE_LAT_LIM)
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    rad = math.radians(latc)
    y = min(max(int(math.floor(
        (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi)
        / 2.0 * n)), 0), n - 1)
    return x, y


MVT_X, MVT_Y = _slippy_xy(40.0, -74.0, MVT_Z)  # geo.py's query center


def _fine_xy_sql() -> str:
    return f"""
g AS (
  SELECT c_custkey, c_acctbal,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer),
c AS (
  SELECT c_custkey, c_acctbal, lon,
         least(greatest(lat, -{GEOTILE_LAT_LIM!r}), {GEOTILE_LAT_LIM!r})
           AS latc
  FROM g),
t AS (
  SELECT c_custkey, c_acctbal,
    least(greatest(CAST(floor((lon + 180.0) / 360.0 * {_MVT_FINE_N})
                        AS BIGINT), 0), {_MVT_FINE_N - 1}) AS xt,
    least(greatest(CAST(floor(
        (1.0 - ln(tan(radians(latc)) + 1.0 / cos(radians(latc)))
               / {math.pi!r}) / 2.0 * {_MVT_FINE_N}) AS BIGINT),
                   0), {_MVT_FINE_N - 1}) AS yt
  FROM c)"""


@register("search_mvt_tile", oracle=f"""
WITH {_fine_xy_sql()},
hit AS (
  SELECT * FROM t
  WHERE xt // {1 << MVT_GRID_BITS} = {MVT_X}
    AND yt // {1 << MVT_GRID_BITS} = {MVT_Y}),
ranked AS (
  SELECT xt, yt, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY xt, yt
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM hit)
SELECT '{_MVT_FINE_Z}/' || CAST(xt AS VARCHAR) || '/'
         || CAST(yt AS VARCHAR) AS cell,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS sum_bal,
       max(CASE WHEN rn = 1 THEN c_custkey END) AS top_custkey,
       CAST(max(CASE WHEN rn = 1 THEN c_acctbal END) AS DOUBLE)
         AS top_bal
FROM ranked GROUP BY xt, yt
ORDER BY n DESC, cell LIMIT 25
""")
def search_mvt_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `_mvt` vector-tile search (`GET /idx/_mvt/<field>/{MVT_Z}/
    {MVT_X}/{MVT_Y}?grid_precision={MVT_GRID_BITS}`): everything the
    tile response carries, relationally — hits inside ONE target
    slippy tile bucketed into its {1 << MVT_GRID_BITS}x
    {1 << MVT_GRID_BITS} sub-cell grid (the `aggs` layer: count +
    sum), plus each cell's top feature by account balance (the `hits`
    layer cut, size-per-cell 1).

    Scale shape: cell coords are the geotile JVM column math in the
    scan; the TILE FILTER is an integer shift of the fine coords (one
    predicate, map-side — on a lat/lon-partitioned layout it becomes
    partition pruning, which is why tile serving scales: each request
    reads 1/4^z of the corpus); the hits-layer cut is a per-cell
    WindowGroupLimit (rank 1), never a global sort; the aggs layer is
    one partial-agg'd groupBy over ≤4^{MVT_GRID_BITS} cells."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    latc = F.least(F.greatest(F.col("lat"), F.lit(-GEOTILE_LAT_LIM)),
                   F.lit(GEOTILE_LAT_LIM))
    rad = F.radians(latc)
    xt = F.least(F.greatest(
        F.floor((F.col("lon") + 180.0) / 360.0 * _MVT_FINE_N).cast("long"),
        F.lit(0)), F.lit(_MVT_FINE_N - 1))
    yt = F.least(F.greatest(
        F.floor((F.lit(1.0)
                 - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
                 / F.lit(math.pi)) / F.lit(2.0) * _MVT_FINE_N).cast("long"),
        F.lit(0)), F.lit(_MVT_FINE_N - 1))
    hit = (cust.select("c_custkey", "c_acctbal",
                       xt.alias("xt"), yt.alias("yt"))
               .where((F.col("xt") / (1 << MVT_GRID_BITS))
                      .cast("long") == MVT_X)
               .where((F.col("yt") / (1 << MVT_GRID_BITS))
                      .cast("long") == MVT_Y))
    rn = F.row_number().over(
        W.partitionBy("xt", "yt")
         .orderBy(F.desc("c_acctbal"), "c_custkey"))
    ranked = hit.withColumn("rn", rn)
    cell = F.concat(F.lit(f"{_MVT_FINE_Z}/"),
                    F.col("xt").cast("string"), F.lit("/"),
                    F.col("yt").cast("string"))
    return (ranked.groupBy("xt", "yt")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
                  .cast("double").alias("sum_bal"),
                 F.max(F.when(F.col("rn") == 1, F.col("c_custkey")))
                  .alias("top_custkey"),
                 F.max(F.when(F.col("rn") == 1, F.col("c_acctbal")))
                  .cast("double").alias("top_bal"))
            .select(cell.alias("cell"), "n", "sum_bal",
                    "top_custkey", "top_bal")
            .orderBy(F.desc("n"), "cell").limit(25))
