"""Unit tests for the stateful streaming gap tracker
(streaming/stateful.py::gap_stats_stateful) — the multi-batch
monotone-emission property the registry twin's MAX-per-type rollup
rests on, exercised through the per-group function directly (the
bigram-test fake device). Drained-output oracle parity at smoke scale
rides the r15 staged subprocess smoke."""

from __future__ import annotations

import pandas as pd


class _FakeState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True


def _capture_fn():
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

    st.gap_stats_stateful(FakeDF())
    return captured["fn"]


def _batch(ms_eids):
    return pd.DataFrame({"ms": [m for m, _ in ms_eids],
                         "event_id": [e for _, e in ms_eids]})


def test_gap_partials_match_full_sequence_and_are_monotone(spark):
    """Micro-batches slicing the timeline [10, 30 | 60 | 100] must end
    with the exact sufficient statistics of the whole gap sequence
    (20, 30, 40) — the 30→60 boundary gap counted exactly once by the
    later batch — and every emission must be monotone so the MAX
    rollup is the final value."""
    fn = _capture_fn()
    state = _FakeState()
    batches = [_batch([(10, 0), (30, 1)]), _batch([(60, 2)]),
               _batch([(100, 3)])]
    seen = []
    for b in batches:
        for out in fn(("err",), iter([b]), state):
            r = out.iloc[0]
            seen.append((int(r["n"]), int(r["s1"]), int(r["s2"])))
    assert seen[-1] == (3, 20 + 30 + 40, 20 * 20 + 30 * 30 + 40 * 40)
    for a, b in zip(seen, seen[1:]):
        assert all(x <= y for x, y in zip(a, b)), seen
    # state carries the last (ms, event_id) for the next batch
    assert state.exists and state.get[0] == 100 and state.get[1] == 3


def test_gap_single_batch_restores_order_like_lead(spark):
    """A shuffled single batch must fold in (ms, event_id) order —
    identical stats to the batch lead() window."""
    fn = _capture_fn()
    state = _FakeState()
    shuffled = _batch([(100, 3), (10, 0), (60, 2), (30, 1)])
    outs = list(fn(("x",), iter([shuffled]), state))
    r = outs[0].iloc[0]
    assert (int(r["n"]), int(r["s1"]), int(r["s2"])) == \
        (3, 90, 20 * 20 + 30 * 30 + 40 * 40)


def test_gap_tie_on_ms_breaks_by_event_id(spark):
    """Equal timestamps fold in event_id order (zero-width gaps), the
    same total order the batch window uses."""
    fn = _capture_fn()
    state = _FakeState()
    outs = list(fn(("x",), iter([_batch([(50, 2), (50, 1), (70, 3)])]),
                   state))
    r = outs[0].iloc[0]
    # gaps: (50,1)->(50,2)=0, (50,2)->(70,3)=20
    assert (int(r["n"]), int(r["s1"]), int(r["s2"])) == (2, 20, 400)


def test_gap_out_of_order_batch_fails_loudly():
    """An event OLDER than the stored last_ms would fold a negative
    gap and silently diverge s1/s2 from the batch lead() twin — the
    fold must raise instead (ADVICE r14: the per-key event-time-order
    source assumption is now asserted, not assumed)."""
    import pytest

    fn = _capture_fn()
    state = _FakeState()
    list(fn(("x",), iter([_batch([(50, 0), (80, 1)])]), state))
    with pytest.raises(ValueError, match="out-of-order"):
        list(fn(("x",), iter([_batch([(40, 2)])]), state))
    # ties with the stored boundary are NOT out of order (zero gap)
    state2 = _FakeState()
    list(fn(("y",), iter([_batch([(50, 0)])]), state2))
    outs = list(fn(("y",), iter([_batch([(50, 1)])]), state2))
    r = outs[0].iloc[0]
    assert (int(r["n"]), int(r["s1"]), int(r["s2"])) == (1, 0, 0)
