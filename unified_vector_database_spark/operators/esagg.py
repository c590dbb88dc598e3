"""Aggregation-surface completion: the Elasticsearch aggregation
types not yet covered elsewhere — weighted_avg, numeric histogram,
multi_terms, bucket_selector (the HAVING pipeline agg), and the
cumulative_sum/derivative pipeline pair over a date_histogram.

Reference parity: the ES side of the reference stack exposes these
as first-class aggs (`weighted_avg`, `histogram`, `multi_terms`,
`bucket_selector`, `cumulative_sum`, `derivative`); the relational
twins are unremarkable SQL, which is the point — each compiles to
one partial-aggregating scan plus at most one bounded window.

Scale shapes:
- weighted_avg / histogram / multi_terms: single scan → partial agg;
  histogram bucket keys are value-range-bounded, multi_terms output
  is cut by TakeOrdered, never a full sort.
- bucket_selector: the HAVING predicate evaluates on aggregated
  buckets (|users| rows), not events — filter above the agg, below
  the TakeOrdered.
- pipeline aggs: the running window orders day buckets WITHIN each
  event_type partition (≤ days rows per group) — bounded, partitioned,
  and the running total accumulates in exact DECIMAL (order-fixed by
  the window, engine-identical) before the final DOUBLE cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..registry import register

HIST_INTERVAL = 50.0
SELECTOR_MIN_EVENTS = 70


@register("weighted_avg_price", oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(20,2)))
            AS DOUBLE) AS wsum,
       round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(20,2)))
                  AS DOUBLE)
             / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),
             6) AS weighted_avg_price
FROM lineitem
GROUP BY 1 ORDER BY 1
""")
def weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `weighted_avg` agg: mean extendedprice weighted by quantity
    per returnflag. Both numerator and denominator accumulate as
    exact DECIMAL (order-independent under any partitioning); only
    the final ratio is floating point."""
    li = tables.load(spark, sf_dir, "lineitem")
    wsum = F.sum((F.col("l_extendedprice") * F.col("l_quantity"))
                 .cast("decimal(20,2)")).cast("double")
    qsum = F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
    return (li.groupBy("l_returnflag")
              .agg(wsum.alias("wsum"),
                   F.round(wsum / qsum, 6).alias("weighted_avg_price"))
              .orderBy("l_returnflag"))


@register("value_histogram", oracle=f"""
SELECT floor(value / {HIST_INTERVAL!r}) * {HIST_INTERVAL!r} AS bucket,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1 ORDER BY 1
""")
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `histogram` agg over a numeric field: fixed-interval
    buckets with count + sum. The bucket key is map-side floor math;
    cardinality is bounded by the value range, so the shuffle moves
    bucket rows only."""
    ev = tables.load(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / HIST_INTERVAL) * F.lit(HIST_INTERVAL)
    return (ev.groupBy(bucket.alias("bucket"))
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("value").cast("decimal(18,2)"))
                    .cast("double").alias("total_value"))
              .orderBy("bucket"))


@register("multi_terms_agg", oracle="""
SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY n DESC, event_type, hr LIMIT 15
""")
def multi_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `multi_terms` agg: top composite (event_type, hour) buckets
    by doc count. One partial agg over the composite key,
    TakeOrdered cut."""
    ev = tables.load(spark, sf_dir, "events")
    return (ev.groupBy("event_type", F.hour("ts").alias("hr"))
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("value").cast("decimal(18,2)"))
                    .cast("double").alias("total_value"))
              .orderBy(F.desc("n"), "event_type", "hr").limit(15))


@register("bucket_selector_having", oracle=f"""
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
HAVING count(*) >= {SELECTOR_MIN_EVENTS}
ORDER BY total_value DESC, user_id LIMIT 20
""")
def bucket_selector_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bucket_selector` pipeline agg (= SQL HAVING): keep only
    user buckets with ≥ min_events events, page the heaviest. The
    predicate runs on |users| aggregated rows, never on raw events."""
    ev = tables.load(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
              .agg(F.count("*").alias("n_events"),
                   F.sum(F.col("value").cast("decimal(18,2)"))
                    .cast("double").alias("total_value"))
              .where(F.col("n_events") >= SELECTOR_MIN_EVENTS)
              .orderBy(F.desc("total_value"), "user_id").limit(20))


@register("events_pipeline_aggs", oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(value AS DECIMAL(18,2))) AS dsum
  FROM events GROUP BY 1, 2)
SELECT event_type, day,
       CAST(dsum AS DOUBLE) AS daily_value,
       CAST(sum(dsum) OVER (PARTITION BY event_type ORDER BY day)
            AS DOUBLE) AS cumulative_value,
       CAST(dsum - lag(dsum) OVER (PARTITION BY event_type ORDER BY day)
            AS DOUBLE) AS derivative
FROM daily ORDER BY event_type, day
""")
def events_pipeline_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `cumulative_sum` + `derivative` pipeline aggs over a
    date_histogram: daily totals per event type with a running total
    and day-over-day delta. The window runs over ≤ days bucket rows
    per event_type partition; the running sum accumulates the exact
    per-day DECIMALs in window order, so it is engine-identical, and
    only the output columns cast to DOUBLE."""
    ev = tables.load(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
               .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                     .alias("dsum")))
    w = W.partitionBy("event_type").orderBy("day")
    return (daily.select(
                "event_type", "day",
                F.col("dsum").cast("double").alias("daily_value"),
                F.sum("dsum").over(w).cast("double")
                 .alias("cumulative_value"),
                (F.col("dsum") - F.lag("dsum").over(w)).cast("double")
                 .alias("derivative"))
            .orderBy("event_type", "day"))


ANOM_WIN = 7      # trailing days in the moving-stats frame
ANOM_Z = 2.0


@register("events_anomaly", oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(value AS DECIMAL(18,2))) AS dsum
  FROM events GROUP BY 1, 2),
w AS (
  SELECT event_type, day, CAST(dsum AS DOUBLE) AS daily_value,
         CAST(sum(dsum) OVER f AS DOUBLE) AS s1,
         CAST(sum(dsum * dsum) OVER f AS DOUBLE) AS s2,
         count(*) OVER f AS n
  FROM daily
  WINDOW f AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {ANOM_WIN - 1} PRECEDING AND CURRENT ROW)),
z AS (
  SELECT event_type, day, daily_value,
         CASE WHEN n < {ANOM_WIN}
                   OR (s2 - s1 * s1 / n) / (n - 1) <= 0 THEN NULL
              ELSE (daily_value - s1 / n)
                   / sqrt((s2 - s1 * s1 / n) / (n - 1)) END AS zraw
  FROM w)
SELECT event_type, day, daily_value, round(zraw, 4) AS z,
       CAST(CASE WHEN abs(zraw) > {ANOM_Z!r} THEN 1 ELSE 0 END AS INT)
         AS is_anomaly
FROM z ORDER BY event_type, day
""")
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving z-score anomaly flagging (ES `moving_fn` stddev /
    anomaly-detection rollup): each day's total scored against the
    trailing {window}-day mean/σ within its series. The moving
    moments accumulate as exact DECIMALs inside the ordered frame
    (engine-identical regardless of partitioning), so z and the flag
    are deterministic; only full frames get a score. The window runs
    over ≤days bucket rows per event_type partition."""
    ev = tables.load(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
               .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                     .alias("dsum")))
    f = (W.partitionBy("event_type").orderBy("day")
          .rowsBetween(-(ANOM_WIN - 1), 0))
    w = daily.select(
        "event_type", "day",
        F.col("dsum").cast("double").alias("daily_value"),
        F.sum("dsum").over(f).cast("double").alias("s1"),
        F.sum(F.col("dsum") * F.col("dsum")).over(f).cast("double")
         .alias("s2"),
        F.count("*").over(f).alias("n"))
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) \
        / (F.col("n") - 1)
    zraw = F.when((F.col("n") < ANOM_WIN) | (var <= 0), F.lit(None)) \
            .otherwise((F.col("daily_value") - F.col("s1") / F.col("n"))
                       / F.sqrt(var))
    return (w.select("event_type", "day", "daily_value",
                     F.round(zraw, 4).alias("z"),
                     F.when(F.abs(zraw) > ANOM_Z, 1).otherwise(0)
                      .cast("int").alias("is_anomaly"))
             .orderBy("event_type", "day"))
