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


# --------------------------------------------------- EQL sequence (ES)

EQL_MAXSPAN_S = 172_800   # sequence by user_id with maxspan=48h
# (the synthetic events stream has ~7 h median per-user gaps — the
# production 30m-style maxspan would be vacuous here; the knob is the
# EQL `with maxspan` parameter verbatim)


@register("eql_sequence", oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
v AS (
  SELECT *,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
  FROM e),
c AS (
  SELECT *,
         max(CASE WHEN event_type = 'click' AND lv IS NOT NULL
                  THEN struct_pack(cts := ts, vts := lv) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
  FROM v),
m AS (
  SELECT user_id, ts, epoch_us(ts) - epoch_us(lc.vts) AS span_us
  FROM c
  WHERE event_type = 'purchase' AND lc IS NOT NULL
    AND epoch_us(ts) - epoch_us(lc.vts) <= {EQL_MAXSPAN_S * 1_000_000})
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) AS n_sequences,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(CAST(sum(span_us) AS DOUBLE) / count(*) / 1000000.0, 6)
         AS avg_span_s
FROM m GROUP BY 1 ORDER BY 1
""")
def eql_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES EQL `sequence by user_id with maxspan=48h [view] [click]
    [purchase]` — the security/observability temporal-join surface of
    the ES backend (EQL sequences are how Elastic detections chain
    events). Matching is last-touch deterministic: a purchase matches
    when a click strictly precedes it and a view strictly precedes
    that click (same user), with the whole view→purchase span inside
    maxspan. The chain resolves with two carried window states — the
    latest prior view timestamp, then the latest prior
    (click, its-view) pair carried as an ordered struct — so every
    row is touched exactly once, no self-joins.

    Scale shape: ONE shuffle on the sequence key (user_id); both
    carries share that window; matched sequences reduce to a
    |days|-row census. At 100 TB the window partitions by join key
    exactly as ES shards EQL state by the `by` field."""
    ev = tables.load_events(spark, sf_dir)
    e = ev.where(F.col("event_type").isin("view", "click", "purchase")) \
          .select("user_id", "event_id", "event_type", "ts")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, -1))
    lv = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    v = e.withColumn("lv", lv)
    lc = F.max(F.when((F.col("event_type") == "click")
                      & F.col("lv").isNotNull(),
                      F.struct(F.col("ts").alias("cts"),
                               F.col("lv").alias("vts")))).over(w)
    c = v.withColumn("lc", lc)
    span = F.unix_micros("ts") - F.unix_micros(F.col("lc.vts"))
    m = (c.where((F.col("event_type") == "purchase")
                 & F.col("lc").isNotNull()
                 & (span <= EQL_MAXSPAN_S * 1_000_000))
          .select("user_id", "ts", span.alias("span_us")))
    return (m.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
             .agg(F.count("*").alias("n_sequences"),
                  F.countDistinct("user_id").cast("long").alias("n_users"),
                  F.round(F.sum("span_us").cast("double")
                          / F.count("*") / 1_000_000.0, 6)
                   .alias("avg_span_s"))
             .orderBy("day"))


# ------------------------------------- TSDB counter rate (ES time_series)

RATE_TOP = 10


@register("counter_rate_resets", oracle=f"""
WITH o AS (
  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
d AS (
  SELECT user_id, us,
         CAST(round(CASE WHEN prev IS NULL THEN 0.0
                         WHEN value < prev THEN value
                         ELSE value - prev END, 6) AS DECIMAL(18,6))
           AS inc,
         CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END
           AS is_reset
  FROM o),
s AS (
  SELECT user_id, count(*) AS n_samples,
         CAST(sum(is_reset) AS BIGINT) AS n_resets,
         CAST(sum(inc) AS DOUBLE) AS total_inc,
         (max(us) - min(us)) / 3600000000.0 AS hours
  FROM d GROUP BY user_id)
SELECT user_id, n_samples, n_resets,
       round(total_inc, 6) AS total_inc,
       round(total_inc / hours, 6) AS rate_per_hour
FROM s WHERE n_samples >= 2 AND hours > 0
ORDER BY rate_per_hour DESC, user_id LIMIT {RATE_TOP}
""")
def counter_rate_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES TSDB `rate` over a counter field (time_series aggregation
    semantics): per series — user_id is the dimension key — readings
    are lag-diffed in time order and a DROP in value is a counter
    reset, contributing the new reading instead of a negative delta
    (exactly how ES and Prometheus rate() handle restarts). The
    per-series increase normalizes by the series' observed time span
    to a per-hour rate; top series reported.

    Scale shape: ONE shuffle partitions rows by series key (how a
    TSDB routes/stores them — ES _tsid); the lag window and the
    rollup share it. Increments round then fold as DECIMAL so the
    per-series sum is exact and order-free; the census output is
    |series| rows cut by TakeOrdered."""
    ev = tables.load_events(spark, sf_dir)
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select("user_id", "value", F.unix_micros("ts").alias("us"),
                  F.lag("value").over(wl).alias("prev"))
    inc = (F.when(F.col("prev").isNull(), F.lit(0.0))
            .when(F.col("value") < F.col("prev"), F.col("value"))
            .otherwise(F.col("value") - F.col("prev")))
    d = o.select(
        "user_id", "us",
        F.round(inc, 6).cast("decimal(18,6)").alias("inc"),
        F.when(F.col("prev").isNotNull()
               & (F.col("value") < F.col("prev")), 1).otherwise(0)
         .alias("is_reset"))
    s = (d.groupBy("user_id")
          .agg(F.count("*").alias("n_samples"),
               F.sum("is_reset").cast("long").alias("n_resets"),
               F.sum("inc").cast("double").alias("total_inc"),
               ((F.max("us") - F.min("us")) / 3600000000.0).alias("hours")))
    return (s.where((F.col("n_samples") >= 2) & (F.col("hours") > 0))
             .select("user_id", "n_samples", "n_resets",
                     F.round("total_inc", 6).alias("total_inc"),
                     F.round(F.col("total_inc") / F.col("hours"), 6)
                      .alias("rate_per_hour"))
             .orderBy(F.desc("rate_per_hour"), "user_id").limit(RATE_TOP))
