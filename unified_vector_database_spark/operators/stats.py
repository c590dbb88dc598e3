"""Statistical aggregation surface — the remaining Elasticsearch
metric/bucket aggs not yet covered elsewhere: `extended_stats`,
`string_stats`, `matrix_stats`, `top_hits`, `auto_date_histogram`,
`geo_centroid`, `median_absolute_deviation`, `boxplot`.

Reference parity: the ES backend of the reference stack
(`tests/cpu/docker-compose.yml` elasticsearch service; README.md:82
`VECTOR_DB=elastic`) exposes each of these as a first-class
aggregation. The Spark twin is a single partially-aggregated scan per
op (plus one bounded window for top_hits and one 1-row broadcast for
auto_date_histogram).

Cross-engine float determinism (the r1 Decimal lesson applied
forward): every accumulated quantity is summed as exact DECIMAL —
order-independent under any partitioning — and only converted to
DOUBLE for the final closed-form moment math, which is written as the
byte-identical expression on both engines. Squares/products of the
2-decimal test values are exact 4-decimal rationals whose IEEE-double
products sit ~1e-13 from the true value, far inside the 5e-5 rounding
boundary of the DECIMAL(…,4) cast, so the casts cannot diverge.

Scale shapes:
- extended_stats / matrix_stats / geo_centroid / string_stats: one
  scan, map-side partial aggregation, bucket-count-sized shuffle.
  string_stats' per-character counts are 27 map-side length-diff
  expressions (no explode, no extra shuffle).
- top_hits: per-bucket window row_number over (bucket, order key) —
  the shuffle moves only the projected hit fields, and Spark 4's
  WindowGroupLimit pushes the rank<=N cut map-side.
- auto_date_histogram: two jobs by necessity (the interval depends on
  the data span) — a 1-row min/max agg broadcast into the bucketing
  scan; the ladder choice is a deterministic CASE both engines
  compute from the same two timestamps.
- median_absolute_deviation / boxplot: exact percentiles shuffle the
  group's values (bounded by event-type cardinality here); the 100 TB
  path swaps in t-digest `approx_percentile` — exact is used because
  the oracle must hash-match.
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..registry import register

# ---------------------------------------------------------- extended_stats


@register("extended_stats_agg", oracle="""
WITH s AS (
  SELECT event_type,
         count(*) AS n,
         min(value) AS vmin,
         max(value) AS vmax,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
         CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS vsumsq
  FROM events GROUP BY 1)
SELECT event_type, n, vmin, vmax, vsum,
       vsumsq AS sum_of_squares,
       round(vsum / n, 6) AS avg_value,
       round(vsumsq / n - (vsum / n) * (vsum / n), 6) AS variance_pop,
       round(sqrt(greatest(vsumsq / n - (vsum / n) * (vsum / n), 0)), 6)
         AS std_dev_pop
FROM s ORDER BY event_type
""")
def extended_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `extended_stats` agg: count/min/max/sum/sum_of_squares/avg/
    variance/std per event type. Both power sums accumulate as exact
    DECIMAL (order-independent); the moments are closed-form double
    math over those two exact sums, identical on both engines."""
    ev = tables.load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.sum(F.col("value").cast("decimal(18,2)"))
         .cast("double").alias("vsum"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
         .cast("double").alias("vsumsq"))
    mean = F.col("vsum") / F.col("n")
    var = F.col("vsumsq") / F.col("n") - mean * mean
    return (agg.select(
        "event_type", "n", "vmin", "vmax", "vsum",
        F.col("vsumsq").alias("sum_of_squares"),
        F.round(mean, 6).alias("avg_value"),
        F.round(var, 6).alias("variance_pop"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std_dev_pop"))
        .orderBy("event_type"))


# ------------------------------------------------------------ string_stats

# The counted alphabet: the 26 lowercase letters plus space. Counts
# come from the classic length-difference identity
# count(c) = len(text) - len(replace(text, c, '')) — integer-exact,
# map-side, no explode. Entropy is then closed-form double math over
# exact integer counts.
_ALPHABET = list(string.ascii_lowercase) + [" "]


def _char_count_sql(c: str) -> str:
    lit = "' '" if c == " " else f"'{c}'"
    return f"sum(length(text) - length(replace(text, {lit}, '')))"


@register("string_stats_agg", oracle=f"""
WITH counts AS (
  SELECT lang,
         count(*) AS n_docs,
         min(length(text)) AS min_len,
         max(length(text)) AS max_len,
         CAST(sum(length(text)) AS BIGINT) AS total_len,
         {', '.join(f'CAST({_char_count_sql(c)} AS BIGINT) AS c{i}'
                    for i, c in enumerate(_ALPHABET))}
  FROM documents GROUP BY 1),
tot AS (
  SELECT *, ({' + '.join(f'c{i}' for i in range(len(_ALPHABET)))}) AS n_chars
  FROM counts)
SELECT lang, n_docs, min_len, max_len,
       round(CAST(total_len AS DOUBLE) / n_docs, 6) AS avg_len,
       round(-({' + '.join(
           f'(CASE WHEN c{i} = 0 THEN 0.0 ELSE '
           f'(CAST(c{i} AS DOUBLE) / n_chars) * '
           f'log2(CAST(c{i} AS DOUBLE) / n_chars) END)'
           for i in range(len(_ALPHABET)))}), 6) AS entropy
FROM tot ORDER BY lang
""")
def string_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `string_stats` agg with `show_distribution`-grade character
    entropy, per language bucket: doc count, min/max/avg length, and
    the Shannon entropy of the (a-z + space) character distribution.
    27 length-diff count expressions run map-side in the scan
    (one pass over the char data, no explode/shuffle); entropy is
    exact-integer-count double math."""
    docs = tables.load(spark, sf_dir, "documents")
    cnt_cols = [
        F.sum(F.expr(
            f"length(text) - length(replace(text, {'chr(32)' if c == ' ' else repr(c)}, ''))"))
         .cast("long").alias(f"c{i}")
        for i, c in enumerate(_ALPHABET)]
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.min(F.length("text")).alias("min_len"),
        F.max(F.length("text")).alias("max_len"),
        F.sum(F.length("text")).cast("long").alias("total_len"),
        *cnt_cols)
    cols = [F.col(f"c{i}") for i in range(len(_ALPHABET))]
    agg = agg.withColumn("n_chars", sum(cols[1:], cols[0]))
    ent_terms = []
    for i in range(len(_ALPHABET)):
        p = F.col(f"c{i}").cast("double") / F.col("n_chars")
        ent_terms.append(
            F.when(F.col(f"c{i}") == 0, F.lit(0.0)).otherwise(p * F.log2(p)))
    entropy = -sum(ent_terms[1:], ent_terms[0])
    return (agg.select(
        "lang", "n_docs", "min_len", "max_len",
        F.round(F.col("total_len").cast("double") / F.col("n_docs"), 6)
         .alias("avg_len"),
        F.round(entropy, 6).alias("entropy"))
        .orderBy("lang"))


# ------------------------------------------------------------ matrix_stats


@register("matrix_stats_agg", oracle="""
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sp,
         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4)))
              AS DOUBLE) AS sqq,
         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4)))
              AS DOUBLE) AS spp,
         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4)))
              AS DOUBLE) AS sqp
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, n,
       round(sq / n, 6) AS mean_qty,
       round(sp / n, 6) AS mean_price,
       round(sqp / n - (sq / n) * (sp / n), 6) AS cov_pop,
       round((sqp / n - (sq / n) * (sp / n))
             / (sqrt(sqq / n - (sq / n) * (sq / n))
                * sqrt(spp / n - (sp / n) * (sp / n))), 6) AS corr
FROM s ORDER BY l_returnflag
""")
def matrix_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `matrix_stats` agg: covariance + correlation between
    quantity and extended price per returnflag. The five power sums
    accumulate as exact DECIMAL in one partial-agg pass; covariance
    and Pearson correlation are closed-form double math over them —
    never the engine's own covar/corr builtins, whose accumulation
    order (and algorithm) differs between engines."""
    li = tables.load(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("sq"),
        F.sum(p.cast("decimal(20,2)")).cast("double").alias("sp"),
        F.sum((q * q).cast("decimal(28,4)")).cast("double").alias("sqq"),
        F.sum((p * p).cast("decimal(38,4)")).cast("double").alias("spp"),
        F.sum((q * p).cast("decimal(38,4)")).cast("double").alias("sqp"))
    n = F.col("n")
    mq, mp = F.col("sq") / n, F.col("sp") / n
    cov = F.col("sqp") / n - mq * mp
    vq = F.col("sqq") / n - mq * mq
    vp = F.col("spp") / n - mp * mp
    return (s.select(
        "l_returnflag", "n",
        F.round(mq, 6).alias("mean_qty"),
        F.round(mp, 6).alias("mean_price"),
        F.round(cov, 6).alias("cov_pop"),
        F.round(cov / (F.sqrt(vq) * F.sqrt(vp)), 6).alias("corr"))
        .orderBy("l_returnflag"))


# ---------------------------------------------------------------- top_hits

TOP_HITS_PER_BUCKET = 3


@register("top_hits_agg", oracle=f"""
WITH r AS (
  SELECT event_type, event_id, user_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rnk
  FROM events)
SELECT event_type, CAST(rnk AS INT) AS rnk, event_id, user_id, value
FROM r WHERE rnk <= {TOP_HITS_PER_BUCKET}
ORDER BY event_type, rnk
""")
def top_hits_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `top_hits` sub-aggregation: the top-N full documents inside
    each terms bucket (here: highest-value events per event type).
    One window ranked by (value desc, id); Spark 4's WindowGroupLimit
    rewrite cuts to N per group map-side before the shuffle, so the
    exchanged volume is buckets x N rows, not the corpus."""
    ev = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.col("event_id"))
    return (ev.select("event_type", "event_id", "user_id", "value")
              .withColumn("rnk", F.row_number().over(w))
              .where(F.col("rnk") <= TOP_HITS_PER_BUCKET)
              .select("event_type", F.col("rnk").cast("int").alias("rnk"),
                      "event_id", "user_id", "value")
              .orderBy("event_type", "rnk"))


# ------------------------------------------------------ auto_date_histogram

AUTO_HIST_TARGET_BUCKETS = 40


@register("auto_date_histogram", oracle=f"""
WITH b AS (
  SELECT min(ts) AS tmin, max(ts) AS tmax,
         date_diff('hour', min(ts), max(ts)) AS span_h
  FROM events),
lad AS (
  SELECT CASE WHEN span_h <= {AUTO_HIST_TARGET_BUCKETS} THEN 'hour'
              WHEN span_h <= {AUTO_HIST_TARGET_BUCKETS} * 24 THEN 'day'
              ELSE 'month' END AS unit
  FROM b)
SELECT unit,
       date_trunc(unit, ts) AS bucket_start,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events, lad
GROUP BY 1, 2 ORDER BY bucket_start
""")
def auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `auto_date_histogram`: the bucket interval is chosen FROM
    the data so the result has at most ~target buckets — hour if the
    span fits, else day, else month. Two jobs by necessity: a 1-row
    min/max agg, broadcast into the bucketing scan (never a collect
    of data rows); the ladder CASE is the same deterministic
    expression on both engines."""
    ev = tables.load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("ts").alias("tmin"), F.max("ts").alias("tmax"))
    # span = HOUR-BOUNDARY CROSSINGS, not fractional elapsed hours:
    # DuckDB's date_diff('hour', ...) counts crossings, so the Spark
    # side truncates both endpoints to the hour first — otherwise a
    # corpus spanning 40h + 1s lands on different sides of the ladder
    # threshold in the two engines.
    span_h = (F.unix_timestamp(F.date_trunc("hour", "tmax"))
              - F.unix_timestamp(F.date_trunc("hour", "tmin"))) / 3600
    lad = bounds.select(
        F.when(span_h <= AUTO_HIST_TARGET_BUCKETS, F.lit("hour"))
         .when(span_h <= AUTO_HIST_TARGET_BUCKETS * 24, F.lit("day"))
         .otherwise(F.lit("month")).alias("unit"))
    withu = ev.crossJoin(F.broadcast(lad))
    bucket = (F.when(F.col("unit") == "hour", F.date_trunc("hour", "ts"))
               .when(F.col("unit") == "day", F.date_trunc("day", "ts"))
               .otherwise(F.date_trunc("month", "ts")))
    return (withu.groupBy("unit", bucket.alias("bucket_start"))
                 .agg(F.count("*").alias("n"),
                      F.sum(F.col("value").cast("decimal(18,2)"))
                       .cast("double").alias("total_value"))
                 .orderBy("bucket_start"))


# ------------------------------------------------------------ geo_centroid


@register("geo_centroid_agg", oracle="""
WITH geo AS (
  SELECT c_mktsegment,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer)
SELECT c_mktsegment,
       count(*) AS n,
       round(CAST(sum(CAST(lat AS DECIMAL(14,2))) AS DOUBLE) / count(*), 6)
         AS centroid_lat,
       round(CAST(sum(CAST(lon AS DECIMAL(14,2))) AS DOUBLE) / count(*), 6)
         AS centroid_lon
FROM geo GROUP BY 1 ORDER BY 1
""")
def geo_centroid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `geo_centroid` agg over the derived customer coordinates
    (same deterministic pseudo-placement as operators/geo.py): the
    mean point per market segment. Coordinates are exact 2-decimal
    rationals, so the DECIMAL(14,2) cast is lossless and the sum is
    order-independent; only the final mean is floating point."""
    from .geo import with_coords
    cust = tables.load(spark, sf_dir, "customer")
    geo = with_coords(cust)
    return (geo.groupBy("c_mktsegment")
               .agg(F.count("*").alias("n"),
                    F.round(F.sum(F.col("lat").cast("decimal(14,2)"))
                             .cast("double") / F.count("*"), 6)
                     .alias("centroid_lat"),
                    F.round(F.sum(F.col("lon").cast("decimal(14,2)"))
                             .cast("double") / F.count("*"), 6)
                     .alias("centroid_lon"))
               .orderBy("c_mktsegment"))


# ---------------------------------------------- median_absolute_deviation


@register("mad_value", oracle="""
SELECT event_type,
       count(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS median_value,
       round(mad(value), 6) AS mad_value
FROM events GROUP BY 1 ORDER BY 1
""")
def mad_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `median_absolute_deviation` agg per event type:
    median(|x - median(x)|). Spark has no MAD builtin, so it is two
    exact-percentile passes — the per-group median broadcast back
    onto the rows (group-key equi-join against a buckets-sized frame),
    then the median of the absolute deviations. The 100 TB path
    replaces both exact percentiles with t-digest approx_percentile;
    exact is required here for the hash oracle."""
    ev = tables.load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"),
        F.count("*").alias("n"))
    dev = (ev.join(F.broadcast(med), "event_type")
             .select("event_type", "n",
                     F.abs(F.col("value") - F.col("med")).alias("adev"),
                     F.col("med")))
    return (dev.groupBy("event_type")
               .agg(F.max("n").alias("n"),
                    F.round(F.max("med"), 6).alias("median_value"),
                    F.round(F.expr("percentile(adev, 0.5)"), 6)
                     .alias("mad_value"))
               .orderBy("event_type"))


# ----------------------------------------------------------------- boxplot


@register("boxplot_value", oracle="""
SELECT event_type,
       min(value) AS vmin,
       round(quantile_cont(value, 0.25), 6) AS q1,
       round(quantile_cont(value, 0.5), 6) AS q2,
       round(quantile_cont(value, 0.75), 6) AS q3,
       max(value) AS vmax,
       round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6)
         AS iqr
FROM events GROUP BY 1 ORDER BY 1
""")
def boxplot_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `boxplot` agg per event type: min / Q1 / median / Q3 / max
    + IQR, exact linear-interpolated quantiles (Spark `percentile` ==
    DuckDB `quantile_cont`). One grouped agg; the scale path is
    approx_percentile's mergeable t-digest."""
    ev = tables.load(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
              .agg(F.min("value").alias("vmin"),
                   F.round(F.expr("percentile(value, 0.25)"), 6).alias("q1"),
                   F.round(F.expr("percentile(value, 0.5)"), 6).alias("q2"),
                   F.round(F.expr("percentile(value, 0.75)"), 6).alias("q3"),
                   F.max("value").alias("vmax"),
                   F.round(F.expr("percentile(value, 0.75)")
                           - F.expr("percentile(value, 0.25)"), 6)
                    .alias("iqr"))
              .orderBy("event_type"))
