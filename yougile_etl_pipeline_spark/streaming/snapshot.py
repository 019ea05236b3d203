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

__all__ = ["read_events_stream", "tumbling_counts", "run_available_now",
           "session_windows", "run_sessions_available_now",
           "stream_quarantine"]


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (explicit schema — file
    streams never infer)."""
    # The file source wants a directory; glob-filter to the events table.
    # ts on disk is either TIMESTAMP(MICROS) (reads natively) or
    # TIMESTAMP(NANOS) (int64 read + truncate) — same footer probe as the
    # batch reader (sources/tables.py).
    from yougile_etl_pipeline_spark.sources.tables import (
        _convert_events_ts,
        _events_ts_is_nanos,
    )

    nanos = _events_ts_is_nanos(os.path.join(sf_dir, "events.parquet"))
    schema = TESTDATA_SCHEMAS["_events_raw" if nanos else "events"]
    raw = (spark.readStream
           .schema(schema)
           .format("parquet")
           .option("pathGlobFilter", "events.parquet")
           .load(sf_dir))
    return _convert_events_ts(raw) if nanos else raw


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


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Native session windows under streaming: the SAME
    ``groupBy(user_id, session_window(ts, gap))`` the batch query
    `events_session_native` runs, now with a watermark bounding state —
    open sessions persist in the state store only until the watermark
    passes their end, so state is O(active users), not O(history).
    Append mode emits each session exactly once, when it can no longer
    grow."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id", F.session_window("ts", gap))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events"))


def run_sessions_available_now(spark: SparkSession, sf_dir: str,
                               table_name: str = "stream_sessions"
                               ) -> DataFrame:
    q = (session_windows(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


def enriched_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    dimension (user → segment bucket). Static side is re-read per
    micro-batch by Spark; with a broadcastable dim the join never
    shuffles the stream."""
    from pyspark.sql import functions as F

    events = read_events_stream(spark, sf_dir)
    # derive a small static "user dim" from customers (id parity bucket)
    users = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
             .select((F.col("c_custkey") % 100).alias("user_id"),
                     F.col("c_mktsegment").alias("segment"))
             .dropDuplicates(["user_id"]))
    return events.join(F.broadcast(users), "user_id", "left")


def stream_upsert_mart(spark: SparkSession, sf_dir: str, target_path: str,
                       *, checkpoint: str) -> None:
    """foreachBatch → MERGE: each micro-batch upserts its per-user hourly
    aggregates into a parquet mart keyed by (user_id, window_start) — the
    production pattern for streaming into an updatable table (idempotent
    per batch via merge keys; exactly-once via the checkpoint)."""
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.plans.incremental import merge_upsert

    agg = (read_events_stream(spark, sf_dir)
           .withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events"))
           .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), "user_id", "n_events"))

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        merge_upsert(spark, target_path, batch_df,
                     keys=["window_start", "user_id"])

    q = (agg.writeStream.foreachBatch(upsert)
         .outputMode("update")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_quarantine(spark: SparkSession, sf_dir: str,
                      good_path: str, bad_path: str,
                      rules=None) -> tuple[int, int]:
    """Continuous data-quality gate: the event stream is checked against
    the expectations suite and split good/bad inside ``foreachBatch`` —
    BOTH sides written from the same micro-batch, so the quarantine can
    never diverge from the load (the batch `quarantine` contract, made
    continuous). availableNow drain; returns (n_good, n_bad).

    At scale the two writes append to partitioned tables and the bad
    side carries the sorted failed-rule list for triage — checking is
    map-only codegen (plan-audited in batch form), so the gate adds no
    shuffle to the ingest path."""
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.operators.quality import quarantine

    rules = rules or {
        "value_nonneg": F.col("value") >= 0,
        "has_user": F.col("user_id").isNotNull(),
        "known_type": F.col("event_type").isin(
            "click", "view", "purchase", "signup"),
    }
    ev = read_events_stream(spark, sf_dir)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent per micro-batch: both sides land under their
        # batch_id partition via dynamic overwrite, so a retried batch
        # REPLACES its own partition instead of appending duplicates
        # (the same exactly-once contract stream_upsert_mart gets from
        # MERGE keys).
        good, bad = quarantine(batch_df, rules)
        # partitionOverwriteMode is set per-WRITE, not on the session —
        # a session-wide conf.set here would leak "dynamic" into every
        # later overwrite (scrub_keys save/restores the same setting).
        (good.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite").partitionBy("batch_id")
             .option("partitionOverwriteMode", "dynamic")
             .parquet(good_path))
        (bad.withColumn("failed", F.concat_ws(",", "failed"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(bad_path))

    q = (ev.writeStream.foreachBatch(gate)
         .trigger(availableNow=True)
         .option("checkpointLocation", good_path + "_ckpt")
         .start())
    q.awaitTermination()

    def _count(path: str) -> int:
        # A side that never received a row holds only _SUCCESS — reading
        # it would raise "unable to infer schema"; that side counts 0.
        try:
            return spark.read.parquet(path).count()
        except Exception:
            return 0

    return _count(good_path), _count(bad_path)


def dedup_keys_stream(events: DataFrame,
                      keys: list[str] | None = None,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first arrival per key survives, state
    bounded by the event-time watermark (`dropDuplicatesWithinWatermark`
    — the ingestion-time twin of the batch `dedup_exact` family, the
    op that keeps a training-data firehose free of replayed records
    without unbounded state).

    Output is PROJECTED TO THE KEYS: which full row survives a
    duplicate group depends on arrival order (nondeterministic under
    repartitioning), but the surviving KEY SET does not — so the
    projection is exactly the deterministic part, equal to batch
    ``SELECT DISTINCT keys`` whenever every duplicate pair lands
    within one watermark of each other. Under an availableNow drain of
    a static snapshot (one micro-batch, nothing evicted mid-batch)
    that holds unconditionally, which is what makes the registered
    query oracle-pairable rather than rows-only."""
    keys = keys or ["user_id", "event_type"]
    return (events.withWatermark("ts", watermark)
                  .dropDuplicatesWithinWatermark(keys)
                  .select(*keys))


def run_dedup_keys_available_now(spark, sf_dir: str,
                                 table_name: str = "stream_dedup") \
        -> DataFrame:
    """Drain the events stream once through the streaming dedup into a
    memory sink; returns the surviving key set."""
    q = (dedup_keys_stream(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


def dedup_against_store_stream(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Stream-vs-static-store dedup — the INCREMENTAL-INGEST
    primitive (VERDICT r07 #3 candidate): new records stream in, a
    static fingerprint store holds everything already ingested, and
    a stream-static LEFT ANTI join drops the replays. This is the
    streaming twin of `operators/dedup.py::incremental` — the store
    carries 16-byte md5 fingerprints, never bodies, so the anti join
    keys on fixed-width hashes.

    The demo store = fingerprints of every event_id ≡ 0 (mod 3), a
    pure function of the snapshot, which makes the surviving set a
    deterministic projection (`event_id % 3 <> 0`) and the entry
    hash-exact oracle-pairable. The rollup is complete-mode, so the
    (tiny, per-type) result is deterministic at any micro-batch
    slicing — the `segment_counts_stream` argument.

    At 100 TB the store outgrows a broadcast: the same plan falls
    back to a per-batch shuffled stream-static join, and the
    production refinement is a broadcast Bloom prefilter
    (`dedup.py::bloom` bitmap) in front of the exact anti join so
    only probable-duplicates pay the shuffle."""
    events = read_events_stream(spark, sf_dir)
    snap = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    store = (snap.filter(F.col("event_id") % 3 == 0)
             .select(F.md5(F.col("event_id").cast("string"))
                     .alias("fp")))
    fresh = (events.withColumn(
                 "fp", F.md5(F.col("event_id").cast("string")))
             .join(store, "fp", "left_anti"))
    return (fresh.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_new"),
                 F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
                  .alias("total_value")))


def run_dedup_store_available_now(spark: SparkSession, sf_dir: str,
                                  table_name: str = "stream_dedup_store"
                                  ) -> DataFrame:
    q = (dedup_against_store_stream(spark, sf_dir)
         .writeStream.format("memory").queryName(table_name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


def hopping_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hopping-window rollup — the SAME ``F.window('30
    minutes', '10 minutes')`` expression the batch entry
    (`events_hopping_counts`) certifies, under readStream: each event
    lands in exactly three windows, counts aggregate per (window,
    type). Complete output mode keeps every window's count in state
    and re-emits the full (bounded: 3 windows per distinct 10-min
    slice) result each batch, so an availableNow drain equals the
    batch rollup at ANY micro-batch slicing — which is what lets the
    entry share the batch twin's window-enumeration oracle verbatim.
    A production stream would swap complete mode for append +
    ``withWatermark`` to evict closed windows; the expression is
    unchanged — that is the point of certifying it."""
    events = read_events_stream(spark, sf_dir)
    return (events
            .groupBy(F.window("ts", "30 minutes", "10 minutes")
                     .alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_millis(F.col("w.start")).alias("win_start_ms"),
                    "event_type", "n"))


def run_hopping_available_now(spark: SparkSession, sf_dir: str,
                              table_name: str = "stream_hopping"
                              ) -> DataFrame:
    q = (hopping_counts_stream(spark, sf_dir)
         .writeStream.format("memory").queryName(table_name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


def segment_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment + complete-mode aggregation: the event
    stream broadcast-joined to a DETERMINISTIC user→segment dim (min
    segment per user bucket — `enriched_stream`'s dropDuplicates
    survivor is arrival-order-dependent, which would break oracle
    pairing) and rolled up per segment.

    Scale shape: the dim is bounded (≤100 rows here; a real user dim
    broadcast-refreshes per micro-batch), so the stream never
    shuffles for the join — the only exchange is the final bounded
    per-segment aggregate. Complete output mode keeps the whole
    (tiny) result in state, deterministic at any batch slicing."""
    events = read_events_stream(spark, sf_dir)
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    dim = (cust.groupBy((F.col("c_custkey") % 100).alias("user_id"))
               .agg(F.min("c_mktsegment").alias("segment")))
    joined = events.join(F.broadcast(dim), "user_id", "left")
    return (joined
            .groupBy(F.coalesce("segment", F.lit("UNKNOWN"))
                      .alias("segment"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
                  .alias("total_value")))


def run_segments_available_now(spark: SparkSession, sf_dir: str,
                               table_name: str = "stream_segments"
                               ) -> DataFrame:
    q = (segment_counts_stream(spark, sf_dir)
         .writeStream.format("memory").queryName(table_name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


def error_rate_daily_stream(events: DataFrame,
                            watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch SLO view `events_error_rate_daily`:
    daily tumbling windows carrying (n_events, n_errors). State is one
    open window per day within the watermark horizon — O(1) per day,
    with map-side partial aggregation before the keyed shuffle; append
    mode emits each day exactly once, when the watermark passes its
    end."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.count_if(F.col("event_type") == "error").cast("bigint")
                  .alias("n_errors"))
            .select(F.col("w.start").alias("window_start"),
                    "n_events", "n_errors"))


def run_error_rate_available_now(spark: SparkSession, sf_dir: str,
                                 table_name: str = "stream_error_rate"
                                 ) -> DataFrame:
    """Drain the events stream once through the daily SLO aggregate
    into a memory sink. Deterministic projection under availableNow:
    exactly the days whose window end <= max(event_time) - watermark
    flush, each with counts over ALL its events."""
    q = (error_rate_daily_stream(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)
