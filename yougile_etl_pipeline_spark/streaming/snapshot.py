"""Streaming variant of the reference's hourly snapshot schedule.

The reference approximates streaming with an hourly batch DAG
(cron ``0 5,...,20 * * *``, ``dags/yougile_etl_dag.py:341``) stamping
``loaded_ts`` per run (``:280``). The Spark-native equivalent is
Structured Streaming with ``Trigger.AvailableNow``: each invocation
drains whatever arrived, exactly-once per checkpoint — the same
micro-snapshot semantics without the cron/XCom machinery (SURVEY.md
§2.9, declared extension).

Ops demonstrated: file-source readStream with explicit schema, event-time
tumbling window + watermark (late-data policy), streaming dedup within
the watermark, availableNow drain to an in-memory sink for tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.schemas import TESTDATA_SCHEMAS

__all__ = ["read_events_stream", "tumbling_counts", "run_available_now"]


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (explicit schema — file
    streams never infer)."""
    # The file source wants a directory; glob-filter to the events table.
    # ts lands as int64 nanos (see sources/tables.py) and is converted.
    from yougile_etl_pipeline_spark.sources.tables import _convert_events_ts

    raw = (spark.readStream
           .schema(TESTDATA_SCHEMAS["_events_raw"])
           .format("parquet")
           .option("pathGlobFilter", "events.parquet")
           .load(sf_dir))
    return _convert_events_ts(raw)


def tumbling_counts(events: DataFrame,
                    window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling counts with a late-data watermark.

    Output: (window_start, event_type, n_events, total_value). State is
    bounded by the watermark: at 100 TB/day the store holds only open
    windows, and partial aggregation happens map-side before the keyed
    shuffle."""
    return (events
            .withWatermark("ts", watermark)
            .withColumn("event_id_dedup", F.col("event_id"))
            .dropDuplicatesWithinWatermark(["event_id_dedup"])
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
                  .alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))


def run_available_now(spark: SparkSession, sf_dir: str,
                      table_name: str = "stream_tumbling_counts") -> DataFrame:
    """Drain the stream once (availableNow) into a memory sink and return
    the materialized batch DataFrame — the test/driver entry point."""
    q = (tumbling_counts(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)
