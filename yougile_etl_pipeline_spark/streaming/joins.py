"""Stream-stream join: click→purchase attribution as two live streams.

Structured Streaming's stream-stream inner join buffers both sides in
state and emits matches as they arrive; watermarks + the time-range join
condition bound that state (rows older than watermark+range are evicted).
This is the streaming twin of the batch `events_interval_join`
(registry_analytics.py) — same semantics, which the batch-parity test
asserts literally.

Scale: state is O(events within the watermark horizon), partitioned by
the join key (user_id); each micro-batch shuffles only its own rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.streaming.snapshot import read_events_stream

__all__ = ["click_purchase_attribution", "run_attribution_available_now",
           "click_attribution_outer", "run_attribution_outer_available_now"]

ATTRIBUTION_WINDOW_MS = 300_000  # purchase within 5 min after click


def click_purchase_attribution(events: DataFrame,
                               watermark: str = "2 hours") -> DataFrame:
    """Inner stream-stream join: every (click, purchase) pair for the
    same user with 0 < purchase_ts - click_ts <= 5 min. Output schema
    matches the batch `events_interval_join` oracle exactly."""
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", watermark))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", watermark))
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts")
           + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MS} MILLISECONDS")))
    return joined.select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id",
        (F.unix_millis("p_ts") - F.unix_millis("c_ts")).alias("gap_ms"))


def run_attribution_available_now(
        spark: SparkSession, sf_dir: str,
        table_name: str = "stream_click_attribution") -> DataFrame:
    """Drain once (availableNow) into a memory sink — test/driver entry."""
    q = (click_purchase_attribution(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


def click_attribution_outer(events: DataFrame,
                            watermark: str = "2 hours") -> DataFrame:
    """LEFT OUTER stream-stream join: every click eventually emits —
    matched pairs as they arrive (inner semantics, identical to
    `click_purchase_attribution`), and a NULL-purchase row for a click
    once the watermark proves no qualifying purchase can still arrive
    (state eviction = the emission trigger; that is the Structured
    Streaming outer-join contract, and why both sides NEED watermarks
    here, not just for state bounding).

    The unanswered-click stream is the real product shape (abandonment
    / non-conversion feeds); the inner variant can only ever report
    conversions. Clicks newer than (final watermark − window) stay
    buffered rather than emitting a premature NULL — the batch-parity
    test accounts for exactly that boundary."""
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", watermark))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", watermark))
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts")
           + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MS} MILLISECONDS")),
        "leftOuter")
    return joined.select(
        F.col("c_user").alias("user_id"), "click_id", "c_ts",
        "purchase_id",
        (F.unix_millis("p_ts") - F.unix_millis("c_ts")).alias("gap_ms"))


def run_attribution_outer_available_now(
        spark: SparkSession, sf_dir: str,
        table_name: str = "stream_click_attribution_outer") -> DataFrame:
    """Drain once (availableNow) into a memory sink — test/driver entry."""
    q = (click_attribution_outer(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)
