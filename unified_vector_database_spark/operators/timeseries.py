"""Time-series pipeline aggregations over the events stream: ES
date_histogram with extended_bounds (gap fill) and the pipeline-agg
family (moving average / derivative / cumulative sum).

Reference analog: Elasticsearch date_histogram's `extended_bounds` +
`min_doc_count: 0` emits empty buckets; `moving_fn`, `derivative` and
`cumulative_sum` pipeline aggregations post-process the histogram
(reference backends: ES via its aggs DSL — implied surface of the
`elasticsearch` client the reference installs, /root/reference
README.md:95).

Scale shape: the raw scan aggregates FIRST (partial aggs map-side), so
every window/join below runs on bucket-count rows (hours x types —
thousands), not event rows (billions at 100 TB). The bucket grid is
generated from a 1-row min/max agg (sequence + explode — no driver
collect), and the pipeline windows partition by event_type (bounded
series), never an unpartitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..registry import register


@register("events_gap_fill", oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, round(sum(value), 6) AS total_value
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events),
grid AS (
  SELECT g.h, t.event_type
  FROM (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds) g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
SELECT grid.h AS bucket, grid.event_type AS event_type,
       coalesce(hourly.n, 0) AS n,
       coalesce(hourly.total_value, 0.0) AS total_value
FROM grid LEFT JOIN hourly
  ON hourly.h = grid.h AND hourly.event_type = grid.event_type
ORDER BY bucket, grid.event_type
""")
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly date_histogram with empty buckets emitted (ES
    extended_bounds + min_doc_count=0): the full hour x event_type
    grid is generated in-plan from a 1-row bounds agg, then the real
    rollup left-joins onto it with zero fill."""
    ev = tables.load_events(spark, sf_dir)
    # ONE pass over the raw events; bounds and the type set both
    # derive from the bucket-count-sized rollup (min/max of truncated
    # hours equals the truncated min/max — date_trunc is monotone), so
    # the grid costs no extra corpus scan
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
                .agg(F.count("*").alias("n"),
                     F.round(F.sum("value"), 6).alias("total_value"))
                .localCheckpoint())
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(F.explode(F.sequence(
        "h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("bucket"))
    grid = hours.crossJoin(hourly.select("event_type").distinct()) \
                .alias("g")
    h = hourly.alias("h")
    return (grid.join(h, (F.col("h.h") == F.col("g.bucket"))
                      & (F.col("h.event_type") == F.col("g.event_type")),
                      "left")
                .select(F.col("g.bucket").alias("bucket"),
                        F.col("g.event_type").alias("event_type"),
                        F.coalesce(F.col("h.n"), F.lit(0)).alias("n"),
                        F.coalesce(F.col("h.total_value"), F.lit(0.0))
                         .alias("total_value"))
                .orderBy("bucket", "event_type"))


@register("events_moving_avg", oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         round(sum(value), 6) AS revenue
  FROM events GROUP BY 1, 2)
SELECT event_type, day, revenue,
       round(avg(revenue) OVER w7, 6) AS ma7,
       round(revenue - lag(revenue) OVER wo, 6) AS delta,
       round(sum(revenue) OVER wc, 6) AS cum_revenue
FROM daily
WINDOW wo AS (PARTITION BY event_type ORDER BY day),
       w7 AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       wc AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
""")
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggregations over a daily date_histogram: 7-bucket
    moving average (moving_fn), day-over-day derivative, and
    cumulative sum — windows partitioned by event_type so every
    partition is one bounded series. Revenue is rounded BEFORE the
    window math so both engines fold identical doubles in identical
    row order."""
    ev = tables.load_events(spark, sf_dir)
    # cast to DATE: DuckDB's date_trunc('day') yields DATE while
    # Spark's yields TIMESTAMP — pin the output type identically
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").cast("date").alias("day"))
               .agg(F.round(F.sum("value"), 6).alias("revenue")))
    wo = W.partitionBy("event_type").orderBy("day")
    return (daily.select(
        "event_type", "day", "revenue",
        F.round(F.avg("revenue").over(wo.rowsBetween(-6, 0)), 6)
         .alias("ma7"),
        F.round(F.col("revenue") - F.lag("revenue").over(wo), 6)
         .alias("delta"),
        F.round(F.sum("revenue").over(
            wo.rowsBetween(W.unboundedPreceding, 0)), 6)
         .alias("cum_revenue"))
        .orderBy("event_type", "day"))


PR_THRESHOLDS = (10.0, 50.0, 200.0)


@register("events_percentile_ranks", oracle=f"""
SELECT event_type,
       {", ".join(
           f"round(count(*) FILTER (value <= {t!r}) * 1.0 / count(*), 6)"
           f" AS pr_{int(t)}" for t in PR_THRESHOLDS)},
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
""")
def events_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks aggregation (the inverse of percentiles):
    for fixed value thresholds, the fraction of observations at or
    below each — one conditional-count pass, partial-agg'd map-side,
    exact (no sketch needed when the thresholds are known up front).
    The forward direction (exact percentiles + HLL distinct) is
    `events_percentiles`."""
    ev = tables.load_events(spark, sf_dir)
    aggs = [F.round(F.count_if(F.col("value") <= t)
                    / F.count("*"), 6).alias(f"pr_{int(t)}")
            for t in PR_THRESHOLDS]
    return (ev.groupBy("event_type")
              .agg(*aggs, F.count("*").alias("n"))
              .orderBy("event_type"))
