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
