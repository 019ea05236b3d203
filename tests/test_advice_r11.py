"""Regression tests for the ADVICE r11 findings — each pins the fixed
behavior on data shaped to trigger the original defect (the certified
sf tables never exercise these corners, which is why the defects
survived hash parity).

* sql_pivot_multi_agg: an absent (priority, status) cell must emit 0,
  not NULL — the coalesce has to run AFTER the pivot.
* train_packing_efficiency: n_sequences is CEILING division, so a
  total that is an exact multiple of 256 fills exactly total/256
  sequences and utilization reaches 1e6 ppm.
* burst_stateful: multi-batch drains emit one refreshed-peak row per
  batch; the peaks are monotone, so MAX-per-user over the emissions
  (what the registry twin now computes) equals the final peak.
* run_first_seen_available_now: a multi-batch drain must fail loudly
  (first_seen emits once per user — no rollup can repair it).
* mann_kendall single-observation keys: covered in
  tests/test_timeseries.py::test_mann_kendall_single_observation_key_surfaces.
"""

from __future__ import annotations

import pandas as pd
import pytest


def test_pivot_multi_agg_missing_cell_is_zero(spark, monkeypatch):
    """Drop every 'P' order from one priority; the pivoted P_* columns
    for that priority must read 0/0, matching the oracle's
    COALESCE/count_if semantics."""
    from yougile_etl_pipeline_spark import registry_r11
    from yougile_etl_pipeline_spark.registry import QUERIES

    orders = spark.createDataFrame(
        [("1-URGENT", "O", 10.0), ("1-URGENT", "F", 20.0),
         ("2-HIGH", "O", 5.0), ("2-HIGH", "F", 7.0), ("2-HIGH", "P", 9.0)],
        "o_orderpriority string, o_orderstatus string, o_totalprice double")

    monkeypatch.setattr(registry_r11, "load_table",
                        lambda spark, sf, name: orders)
    out = {r["o_orderpriority"]: r
           for r in QUERIES["sql_pivot_multi_agg"](spark, "ignored")
           .collect()}
    urgent = out["1-URGENT"]
    assert (urgent["p_cents"], urgent["p_n"]) == (0, 0)  # absent cell
    assert urgent["p_cents"] is not None
    assert (urgent["o_cents"], urgent["o_n"]) == (1000, 1)
    high = out["2-HIGH"]
    assert (high["p_cents"], high["p_n"]) == (900, 1)


def test_packing_efficiency_exact_multiple_boundary(spark, monkeypatch):
    """32 docs of 8 tokens → one 8-token chunk each → total_tokens =
    256 exactly: n_sequences must be 1 (not 2) and utilization_ppm
    must reach 1_000_000 (ceiling division, ADVICE r11)."""
    from yougile_etl_pipeline_spark import registry_r12
    from yougile_etl_pipeline_spark.registry import QUERIES

    docs = spark.createDataFrame(
        [(i, "s1", "a b c d e f g h") for i in range(32)],
        "doc_id long, source string, text string")
    monkeypatch.setattr(registry_r12, "load_table",
                        lambda spark, sf, name: docs)
    rows = QUERIES["train_packing_efficiency"](spark, "ignored").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["total_tokens"], r["n_chunks"]) == (256, 32)
    assert r["n_sequences"] == 1
    assert r["utilization_ppm"] == 1_000_000


def test_burst_emissions_are_monotone_so_max_recovers_peak():
    """Across micro-batches burst_stateful re-emits the user's
    refreshed peak; the sequence is non-decreasing and its MAX equals
    the true final peak — the property the registry twin's
    MAX-per-user rollup rests on."""
    from yougile_etl_pipeline_spark.streaming import stateful as st

    captured = {}

    class FakeGrouped:
        def applyInPandasWithState(self, fn, **kw):
            captured["fn"] = fn
            return None

    class FakeDF:
        def select(self, *a, **kw):
            return self

        def groupBy(self, *a):
            return FakeGrouped()

    class FakeState:
        def __init__(self):
            self._v, self.exists = None, False

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

    st.burst_stateful(FakeDF())
    fn = captured["fn"]
    state = FakeState()
    emitted = []
    # batch 1: minute 0 → 3 events (peak 3)
    # batch 2: minute 1 → 1 event (peak stays 3)
    # batch 3: minute 2 → 5 events (peak 5)
    batches = [
        pd.DataFrame({"ms": [1_000, 2_000, 3_000], "event_id": [0, 1, 2]}),
        pd.DataFrame({"ms": [61_000], "event_id": [3]}),
        pd.DataFrame({"ms": [120_000 + i for i in range(5)],
                      "event_id": list(range(4, 9))}),
    ]
    for b in batches:
        out = list(fn((7,), iter([b]), state))
        emitted.append(int(out[0]["burst"].iloc[0]))
    assert emitted == [3, 3, 5]
    assert all(a <= b for a, b in zip(emitted, emitted[1:]))
    assert max(emitted) == 5  # == final true peak


def test_assert_single_batch_raises_on_multibatch():
    from yougile_etl_pipeline_spark.streaming.stateful import (
        _assert_single_batch,
    )

    class FakeQuery:
        def __init__(self, progress):
            self.lastProgress = progress

    _assert_single_batch(FakeQuery(None))           # no batch ran: fine
    _assert_single_batch(FakeQuery({"batchId": 0}))  # single batch: fine
    with pytest.raises(RuntimeError, match="micro-batches"):
        _assert_single_batch(FakeQuery({"batchId": 2}))
