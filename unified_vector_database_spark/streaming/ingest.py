"""Structured Streaming ingest (SURVEY §2.9): the reference's live
add/upsert path, re-expressed as readStream -> windowed aggregation /
streaming dedup -> sink.

At scale these are the standard Spark streaming shapes: event-time
tumbling windows with a watermark bound the state store; streaming
dedup keys expire with the watermark so state is O(in-flight window),
not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(stream: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window rollup (streaming twin of analytics.events_hourly)."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))


def stream_into_collection(stream: DataFrame, collection,
                           checkpoint: str):
    """Live ingest into a versioned collection (the reference's
    streaming add/upsert): each micro-batch commits one copy-on-write
    upsert, so readers always see a consistent version and replays are
    idempotent per batch via the checkpoint."""
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        collection.upsert(batch_df)

    return (stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint))


def dedup_events(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup on the event key within the watermark
    horizon (reference: idempotent upsert on id)."""
    return (stream
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def sessionized_counts(stream: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Session-window aggregation (streaming twin of the batch
    lag-based `events_sessionized`): gap-merged windows per user.
    State is one open session per active user, bounded by the
    watermark — sessions close (and emit, in append mode) once the
    watermark passes session_end."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "user_id", "n_events"))


def click_purchase_join(clicks: DataFrame, purchases: DataFrame,
                        horizon: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: purchases attributed to a click by
    the same user within `horizon`. Both sides are watermarked and the
    join condition carries the time bound, so Spark can evict join
    state older than watermark+horizon — without the range predicate
    the state store would grow forever."""
    c = (clicks.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("c_user"),
                 F.col("ts").alias("c_ts"),
                 F.col("event_id").alias("click_id")))
    p = (purchases.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts"),
                 F.col("event_id").alias("purchase_id")))
    cond = ((F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon}")))
    return c.join(p, cond, "inner")
