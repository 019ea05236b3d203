"""Streaming snapshot + multimodal decode-path tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    fake_feature_extract,
)
from yougile_etl_pipeline_spark.sources.tables import load_table
from yougile_etl_pipeline_spark.streaming.snapshot import run_available_now


def test_stream_matches_batch_counts(spark):
    streamed = run_available_now(spark, SF_SMOKE, "t_stream_counts")
    events = load_table(spark, SF_SMOKE, "events")
    # Append mode emits a window only once the watermark passes its end:
    # windows within 2h (watermark) + 1h (window) of the max event time
    # are correctly still open. Everything older must match batch exactly.
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 3 HOURS")
    batch = (events.filter(F.date_trunc("hour", "ts") < cutoff)
             .groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                      "event_type")
             .agg(F.count(F.lit(1)).alias("n_events")))
    got = {(r.window_start, r.event_type): r.n_events
           for r in streamed.filter(F.col("window_start") < cutoff).collect()}
    want = {(r.window_start, r.event_type): r.n_events
            for r in batch.collect()}
    assert got == want
    assert streamed.filter(F.col("window_start").isNull()).count() == 0


def test_decode_media_default_gates_unsupported_payloads(spark):
    # Round-6 contract change: decode_media's default decoder REALLY
    # decodes WAV/BMP (tests/test_media_codec.py) and raises
    # per-payload for formats that need absent codec libraries — a
    # utf-8 text payload is neither container, so the honest gate
    # still fires, now from inside the decoder at execution time.
    docs = load_table(spark, SF_SMOKE, "documents").limit(1)
    media = attach_binary_payload(docs, "text", "doc_id")
    with pytest.raises(Exception, match="NotImplementedError|no pure-Python decoder"):
        decode_media(media).collect()


def test_fake_feature_extract_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter("doc_id = 0")
    media = attach_binary_payload(docs, "text", "doc_id")
    feats = fake_feature_extract(media).collect()[0]
    text = docs.collect()[0].text.encode()
    assert feats.feature == [float(len(text)), float(text[0]),
                             float(text[-1]), float(sum(text) % 997)]
    assert feats.n_bytes == len(text)


def test_stream_static_join_enriches(spark):
    from yougile_etl_pipeline_spark.streaming.snapshot import enriched_stream

    q = (enriched_stream(spark, SF_SMOKE)
         .writeStream.format("memory").queryName("t_enriched")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("t_enriched")
    n = load_table(spark, SF_SMOKE, "events").count()
    assert out.count() == n                          # left join keeps all
    assert out.filter(F.col("segment").isNotNull()).count() > 0


def test_stream_upsert_mart_idempotent(spark, tmp_path):
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        stream_upsert_mart,
    )

    target = str(tmp_path / "mart")
    ck = str(tmp_path / "ck")
    stream_upsert_mart(spark, SF_SMOKE, target, checkpoint=ck)
    first = spark.read.parquet(target)
    n1, total1 = first.count(), first.agg(F.sum("n_events")).collect()[0][0]
    assert n1 > 0
    # re-run with the same checkpoint: no new data -> mart unchanged
    stream_upsert_mart(spark, SF_SMOKE, target, checkpoint=ck)
    again = spark.read.parquet(target)
    assert again.count() == n1
    assert again.agg(F.sum("n_events")).collect()[0][0] == total1
    # keys are unique (merge semantics, not append)
    assert again.select("window_start", "user_id").distinct().count() == n1


def test_stream_stream_join_matches_batch_interval_join(spark):
    """Stream-stream attribution join == batch events_interval_join,
    row for row: availableNow drains everything, and with event time far
    behind wall clock no pair is held back by the watermark."""
    from tests.conftest import SF_SMOKE
    from yougile_etl_pipeline_spark.registry import QUERIES
    from yougile_etl_pipeline_spark.streaming.joins import (
        run_attribution_available_now,
    )

    stream = run_attribution_available_now(
        spark, SF_SMOKE, table_name="t_attr_parity")
    batch = QUERIES["events_interval_join"](spark, SF_SMOKE)
    s_rows = sorted(map(tuple, stream.collect()))
    b_rows = sorted(map(tuple, batch.collect()))
    assert len(s_rows) > 0
    assert s_rows == b_rows


def test_stream_session_window_matches_batch(spark):
    """Native session_window under streaming == batch session_window for
    every session the watermark has closed (append emits a session only
    once it can't grow; sessions ending within watermark-of-max stay
    open and are correctly absent)."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        run_sessions_available_now,
    )

    streamed = run_sessions_available_now(spark, SF_SMOKE)
    events = load_table(spark, SF_SMOKE, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    batch = (events.groupBy("user_id", F.session_window("ts", "30 minutes"))
             .agg(F.count(F.lit(1)).alias("n_events"))
             .select("user_id",
                     F.col("session_window.start").alias("session_start"),
                     F.col("session_window.end").alias("session_end"),
                     "n_events"))
    got = {(r.user_id, r.session_start, r.session_end): r.n_events
           for r in streamed.filter(F.col("session_end") < cutoff).collect()}
    want = {(r.user_id, r.session_start, r.session_end): r.n_events
            for r in batch.filter(F.col("session_end") < cutoff).collect()}
    assert want and got == want


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restarting an availableNow query from its checkpoint processes
    only NEW files: batch-1 rows are not re-emitted when batch 2 lands —
    the exactly-once contract a 16-loads/day mart depends on."""
    import os

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(lo, hi, name):
        spark.range(lo, hi).selectExpr("id AS k") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / name))
        # move the data file into the monitored dir as one new file
        import glob
        import shutil
        part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    def drain():
        q = (spark.readStream.schema("k bigint").parquet(src)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    land(0, 100, "b1")
    drain()
    assert spark.read.parquet(sink).count() == 100
    land(100, 150, "b2")
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 150                      # no batch-1 re-emit
    assert out.select("k").distinct().count() == 150


def test_stream_outer_join_emits_unmatched_after_watermark(spark):
    """LEFT OUTER stream-stream attribution: matched rows equal the
    inner join exactly; NULL-purchase rows are precisely the batch
    no-conversion clicks OLD enough that the final watermark proved no
    purchase can arrive (clicks newer than watermark - window stay
    buffered — the documented append-mode boundary)."""
    from tests.conftest import SF_SMOKE
    from yougile_etl_pipeline_spark.registry import QUERIES
    from yougile_etl_pipeline_spark.streaming.joins import (
        ATTRIBUTION_WINDOW_MS,
        run_attribution_outer_available_now,
    )

    stream = run_attribution_outer_available_now(
        spark, SF_SMOKE, table_name="t_attr_outer_parity")

    matched = stream.filter(F.col("purchase_id").isNotNull()) \
                    .select("user_id", "click_id", "purchase_id", "gap_ms")
    batch_inner = QUERIES["events_interval_join"](spark, SF_SMOKE)
    assert (sorted(map(tuple, matched.collect()))
            == sorted(map(tuple, batch_inner.collect())))

    # batch truth: clicks with NO qualifying purchase at all
    events = load_table(spark, SF_SMOKE, "events")
    clicks = events.filter("event_type = 'click'") \
                   .select("event_id", "user_id", "ts")
    purchases = events.filter("event_type = 'purchase'") \
                      .select(F.col("user_id").alias("p_user"),
                              F.col("ts").alias("p_ts"))
    unconverted = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("ts"))
        & (F.col("p_ts") <= F.col("ts")
           + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MS} MILLISECONDS")),
        "left_anti")
    # the watermark at stream end: max click event time - 2h (the
    # watermark delay); clicks evict once watermark passes
    # c_ts + window, so only sufficiently old clicks emit NULLs
    max_ts = clicks.agg(F.max("ts")).collect()[0][0]
    horizon = (F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
               - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MS} MILLISECONDS"))
    want = {r["event_id"] for r in
            unconverted.filter(F.col("ts") < horizon).collect()}
    got = {r["click_id"] for r in
           stream.filter(F.col("purchase_id").isNull()).collect()}
    assert got, "no unmatched clicks emitted - watermark never advanced"
    # every emitted NULL is a true non-conversion, and every old-enough
    # non-conversion was emitted
    assert got.issubset({r["event_id"] for r in unconverted.collect()})
    assert want.issubset(got)
