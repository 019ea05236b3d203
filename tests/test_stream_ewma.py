"""Stateful streaming EWMA (streaming/stateful.py::ewma_stateful):
batch-parity proof — the streaming rows must LITERALLY EQUAL the batch
`ewma_fixed_point` rows on the same input, which chains to that op's
DuckDB recursive-CTE oracle (tests/test_timeseries.py) for the
transitive correctness proof the rows-only driver row rests on."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.timeseries import (
    ewma_fixed_point,
)
from yougile_etl_pipeline_spark.sources.tables import load_table
from yougile_etl_pipeline_spark.streaming.stateful import (
    ewma_stateful,
    run_ewma_available_now,
)


def test_stream_matches_batch_bit_for_bit(spark):
    got = run_ewma_available_now(spark, SF_SMOKE,
                                 table_name="t_stream_ewma_parity")
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("user_id", "ts", "event_id", "value")
    want = (ewma_fixed_point(ev, "user_id", ["ts", "event_id"],
                             "value")
            .select("user_id", "event_id", "ewma"))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert len(a) > 0
    assert a == b  # exact doubles — same int64 state, same division


def test_batch_mode_group_apply_hand_case(spark):
    # tiny batch frame through the same recurrence via the batch op:
    # documents the contract the stream run reproduces
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 1.0)],
        "user_id long, event_id long, value double")
    out = {r.event_id: r.ewma for r in ewma_fixed_point(
        df, "user_id", ["event_id"], "value").collect()}
    assert out == {1: 1.0, 2: 1.25, 3: 1.1875}


def test_rejects_bad_alpha(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError):
        ewma_stateful(ev, alpha_num=0, alpha_den=4)


def test_sub_millisecond_ordering_matches_batch(spark, tmp_path):
    # two events in the SAME millisecond, 600µs apart, with event_ids
    # ordered AGAINST the time order: a millisecond-truncating sort
    # key would process them batch-divergently (the recurrence is
    # order-sensitive). Streamed through a real availableNow run over
    # a crafted fixture, the output must equal the batch op exactly.
    rows = [(9, "2024-01-01 00:00:00.001200", 1, "a", 1.0, "{}"),
            (5, "2024-01-01 00:00:00.001800", 1, "a", 2.0, "{}"),
            (7, "2024-01-01 00:00:00.000100", 1, "a", 8.0, "{}")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double, props string"
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id",
                 "event_type", "value", "props")
    fixture = str(tmp_path / "sub_ms")
    # write micros-typed timestamps (not INT96) so the file-stream's
    # footer probe reads the same physical type the testdata uses
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        ev.coalesce(1).write.parquet(fixture, mode="overwrite")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    import glob
    import os
    import shutil

    part = glob.glob(os.path.join(fixture, "part-*.parquet"))[0]
    os.rename(part, os.path.join(fixture, "events.parquet"))
    got = run_ewma_available_now(spark, fixture,
                                 table_name="t_stream_ewma_subms")
    stream_like = {(r.user_id, r.event_id): r.ewma
                   for r in got.collect()}
    batch = {(r.user_id, r.event_id): r.ewma
             for r in ewma_fixed_point(
                 ev, "user_id", ["ts", "event_id"], "value")
             .select("user_id", "event_id", "ewma").collect()}
    shutil.rmtree(fixture, ignore_errors=True)
    assert stream_like == batch
    # time order 7 -> 9 -> 5: the first value seeds the state
    assert stream_like[(1, 7)] == 8.0
