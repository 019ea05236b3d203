"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.9 extension — the Spark-native
mechanism for operators Structured Streaming lacks built-in).

Semantics: events for a user belong to one session while consecutive
gaps stay ≤ `gap`; a larger gap closes the session. Closed sessions are
emitted (append mode); the trailing open session lives in the state
store, keyed by user — state size is O(active users), not O(events),
which is what makes the operator viable on an unbounded stream.

The per-group function receives Arrow-batched pandas frames (never the
whole group in Python-object form) and a typed GroupState; event-time
ordering within the batch is restored locally (micro-batches preserve no
order guarantee).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["sessionize_stateful", "SESSION_SCHEMA",
           "ewma_stateful", "run_ewma_available_now", "EWMA_SCHEMA",
           "burst_stateful", "run_burst_available_now", "BURST_SCHEMA",
           "first_seen_stateful", "run_first_seen_available_now",
           "FIRST_SEEN_SCHEMA",
           "bigram_stateful", "run_bigram_available_now",
           "BIGRAM_SCHEMA",
           "drawdown_stateful", "run_drawdown_available_now",
           "DRAWDOWN_SCHEMA"]

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_ms", T.LongType()),
    T.StructField("session_end_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.LongType()),
    T.StructField("last_ms", T.LongType()),
    T.StructField("n", T.LongType()),
])


def sessionize_stateful(events: DataFrame, *,
                        gap_minutes: int = 30) -> DataFrame:
    """events(user_id, ts, ...) → closed sessions per user.

    Works on a stream (groupBy user → applyInPandasWithState) and equally
    on a batch frame in tests. Emits only *closed* sessions; the last
    session per user stays in state awaiting more data.
    """
    gap_ms = gap_minutes * 60 * 1000

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts = pd.concat([pdf["ms"] for pdf in pdfs]).sort_values().tolist()
        if not ts:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0], 0
            ts = ts[1:]
            n = 1
        out = []
        for t in ts:
            if t - last > gap_ms:
                out.append((user_id, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_start_ms",
                              "session_end_ms", "n_events"])

    from pyspark.sql import functions as F

    with_ms = events.select("user_id", F.unix_millis("ts").alias("ms"))
    return with_ms.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_available_now(spark, sf_dir: str,
                                 table_name: str = "stream_sessions",
                                 gap_minutes: int = 30) -> DataFrame:
    """Drain the events stream once through the stateful sessionizer into
    a memory sink; returns the emitted (closed) sessions."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (sessionize_stateful(read_events_stream(spark, sf_dir),
                             gap_minutes=gap_minutes)
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 next-gen stateful API)
# ---------------------------------------------------------------------------

RUNNING_SCHEMA = ("user_id BIGINT, n_events BIGINT, "
                  "total_value_micros BIGINT")


def running_totals_stream(events):
    """Per-user running totals via ``transformWithStateInPandas`` — the
    Spark 4 successor to ``applyInPandasWithState``: explicit typed
    state handles (ValueState here; the API also offers ListState /
    MapState / timers / TTL) instead of one opaque state tuple, and
    Update output mode emitting the refreshed total each micro-batch.

    Totals accumulate in integer MICROS (value · 1e6 rounded) so state
    merges are exact and the final number is bit-stable regardless of
    micro-batch slicing — the same fixed-point device the batch
    aggregates use via DECIMAL.

    Environment note: the transformWithState runtime requires the
    ``protobuf`` Python package (its state-server protocol) — absent
    here, so the parity test skips via importorskip; on a standard
    cluster install it runs as written. ``applyInPandasWithState``
    (``sessionize_stateful`` above) remains the in-env-tested stateful
    path.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            schema = StructType([
                StructField("n", LongType()),
                StructField("micros", LongType()),
            ])
            self._state = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, micros = self._state.get()
            else:
                n, micros = 0, 0
            import numpy as np
            for pdf in rows:
                n += len(pdf)
                # half-UP per-row rounding (floor(x + 0.5)) — numpy's
                # .round() is half-to-EVEN, which would disagree with
                # any SQL-side ROUND at exact .5 micros; the batch
                # parity test uses the same floor(x + 0.5) formula
                micros += int(np.floor(
                    pdf["value"].fillna(0.0).to_numpy() * 1_000_000
                    + 0.5).sum())
            self._state.update((n, micros))
            yield pd.DataFrame({
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_micros": [micros],
            })

        def close(self) -> None:
            pass

    return (events
            .groupBy("user_id")
            .transformWithStateInPandas(
                RunningTotals(),
                outputStructType=RUNNING_SCHEMA,
                outputMode="Update",
                timeMode="None"))


def run_running_totals_available_now(spark, sf_dir: str,
                                     table_name: str = "stream_running"
                                     ) -> "DataFrame":
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (running_totals_stream(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


# ---------------------------------------------------------------------------
# Stateful streaming EWMA (integer recurrence, parity with the batch op)
# ---------------------------------------------------------------------------

EWMA_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ewma", T.DoubleType()),
])

_EWMA_STATE_SCHEMA = T.StructType([
    T.StructField("s", T.LongType()),
    T.StructField("has", T.BooleanType()),
])


def _tdiv(a: int, q: int) -> int:
    """Truncate-toward-zero integer division — Spark SQL `div`
    semantics (Python's // floors, which differs for negatives)."""
    return a // q if a >= 0 else -((-a) // q)


def ewma_stateful(events: DataFrame, *,
                  alpha_num: int = 1, alpha_den: int = 4,
                  value_scale: int = 100,
                  sub_scale: int = 10 ** 6) -> DataFrame:
    """Streaming twin of `operators.timeseries.ewma_fixed_point`: the
    SAME int64 recurrence (s₁ = x₁·S; sₜ = (p·xₜ·S + (q−p)·sₜ₋₁) div q)
    run as per-user `applyInPandasWithState`, carrying one int64 of
    state per user across micro-batches — O(active users) state, the
    unbounded-stream path the batch op's docstring points to.

    Ordering contract: rows are sorted by (ts, event_id) WITHIN each
    micro-batch (micro-batches preserve no order); cross-batch order
    is the stream's arrival order, which availableNow file streams
    replay deterministically. On identical input order the emitted
    values are BIT-IDENTICAL to the batch operator — asserted by
    tests/test_stream_ewma.py's literal row-set equality, which chains
    to the batch op's DuckDB recursive-CTE oracle
    (tests/test_timeseries.py) for a transitive correctness proof.

    Emits one row per input event: (user_id, event_id, ewma)."""
    if not (0 < alpha_num < alpha_den):
        raise ValueError("alpha must satisfy 0 < num < den")
    p, q, S = alpha_num, alpha_den, sub_scale

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(pdfs))
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ms", "event_id"])
        s, has = state.get if state.exists else (0, False)
        out = []
        for eid, v in zip(pdf["event_id"], pdf["v_int"]):
            v = int(v)
            s = (v * S if not has
                 else _tdiv(p * v * S + (q - p) * s, q))
            has = True
            out.append((user_id, int(eid),
                        float(s) / float(value_scale * S)))
        state.update((s, has))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "ewma"])

    from pyspark.sql import functions as F

    v_int = (F.col("value")
             .cast(f"decimal(20,{len(str(value_scale)) - 1})")
             * value_scale).cast("bigint")
    # unix_micros, not unix_millis: events.ts carries microsecond
    # precision, and a millisecond key could order two same-ms events
    # differently from the batch op's full-precision (ts, event_id)
    # sort — the recurrence is order-sensitive, so that would break
    # the bit-parity chain this entry's correctness rests on.
    base = events.select("user_id", F.unix_micros("ts").alias("ms"),
                         "event_id", v_int.alias("v_int"))
    return base.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_ewma_available_now(spark, sf_dir: str,
                           table_name: str = "stream_ewma") -> DataFrame:
    """Drain the events stream once through the stateful EWMA into a
    memory sink; returns the per-event smoothed values."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (ewma_stateful(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


# ---------------------------------------------------------------------------
# Stateful streaming top-k (bounded per-key state, r07)
# ---------------------------------------------------------------------------

TOPK_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("rank", T.IntegerType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])

_TOPK_STATE_SCHEMA = T.StructType([
    T.StructField("vals", T.ArrayType(T.DoubleType())),
    T.StructField("ids", T.ArrayType(T.LongType())),
])


def topk_stateful(events: DataFrame, *, k: int = 5) -> DataFrame:
    """Streaming per-key top-k with eviction: each key's state is the
    current k best ``(value, event_id)`` pairs — O(k) per key, the
    bounded-state leaderboard every monitoring/ranking stream needs
    (the use case the Spark-4 ListState API targets;
    ``applyInPandasWithState`` expresses it today with the list pair
    carried in one state tuple).

    Order is the TOTAL order (value DESC, event_id ASC) — the
    deterministic tie-break that makes the operator oracle-pairable
    against a batch ``row_number()`` window. Each micro-batch emits
    the refreshed top-k for keys that received rows; under an
    availableNow drain of a static snapshot (one batch) the output is
    exactly one ranked list per key, equal to the batch window — the
    same single-drain determinism argument as `ewma_stateful`.

    At 100 TB: state is k pairs per key regardless of stream length;
    merging a batch is sort-of-(batch + k) per key, never a global
    sort; the shuffle is the groupBy(key) Arrow exchange only."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (etype,) = key
        # A timeout/no-data invocation hands an EMPTY iterator —
        # pd.concat raises on zero objects, so guard before it
        # (ADVICE r07; same shape failure the sessionize fn guards).
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames)
        pairs = list(zip((float(v) for v in pdf["value"]),
                         (int(i) for i in pdf["event_id"])))
        if state.exists:
            vals, ids = state.get
            pairs += [(float(v), int(i)) for v, i in zip(vals, ids)]
        pairs.sort(key=lambda p: (-p[0], p[1]))
        pairs = pairs[:k]
        state.update(([p[0] for p in pairs], [p[1] for p in pairs]))
        yield pd.DataFrame({
            "event_type": [etype] * len(pairs),
            "rank": pd.array(range(1, len(pairs) + 1), dtype="int32"),
            "event_id": [p[1] for p in pairs],
            "value": [p[0] for p in pairs],
        })

    base = events.select("event_type", "event_id", "value")
    return base.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=TOPK_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_topk_available_now(spark, sf_dir: str, *, k: int = 5,
                           table_name: str = "stream_topk") -> DataFrame:
    """Drain the events stream once through the stateful top-k into a
    memory sink; returns one ranked list per event_type."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (topk_stateful(read_events_stream(spark, sf_dir), k=k)
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # Single-batch drain guard (ADVICE r07): the oracle-pairability
    # argument in `topk_stateful` requires the WHOLE snapshot in ONE
    # micro-batch — a chunked drain (e.g. a maxFilesPerTrigger rate
    # limit appearing on the source) would append one ranked list per
    # chunk per key, and the duplicate ranks would silently
    # hash-mismatch. Fail loudly instead.
    data_batches = sum(
        1 for p in q.recentProgress
        if (p.get("numInputRows") if isinstance(p, dict)
            else p.numInputRows) > 0)
    if data_batches > 1:
        raise RuntimeError(
            f"availableNow drain used {data_batches} data batches; "
            f"the stateful top-k's append-mode output is only "
            f"batch-window-deterministic for a single-batch drain — "
            f"remove rate limits (maxFilesPerTrigger) from the source")
    return spark.table(table_name)


# ---------------------------------------------------------------------------
# Stateful streaming inter-arrival gaps (one int64 of state per key, r10)
# ---------------------------------------------------------------------------

GAP_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("gap", T.LongType()),
])

_GAP_STATE_SCHEMA = T.StructType([
    T.StructField("last_ms", T.LongType()),
])


def interarrival_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of the `events_interarrival_bands` lag: per
    (user, event_type) key the state is ONE int64 — the last seen
    epoch-ms — and each arriving event emits its gap to the previous
    occurrence (first occurrence emits nothing). O(active keys) state,
    the unbounded-stream path for rate fingerprinting / bot detection.

    Ordering contract (the `ewma_stateful` one): rows sort by
    (ms, event_id) within each micro-batch; availableNow file streams
    replay deterministically, so on identical input the emitted gaps
    are BIT-IDENTICAL to the batch window's lag — which is what lets
    the registry entry share the batch oracle hash-exactly."""
    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id, etype = key
        pdf = pd.concat(list(pdfs))
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ms", "event_id"])
        last = state.get[0] if state.exists else None
        rows = []
        for eid, ms in zip(pdf["event_id"], pdf["ms"]):
            ms = int(ms)
            if last is not None:
                rows.append((user_id, etype, int(eid), ms - last))
            last = ms
        state.update((last,))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_type", "event_id",
                               "gap"])

    from pyspark.sql import functions as F

    base = events.select("user_id", "event_type",
                         F.unix_millis("ts").alias("ms"), "event_id")
    return base.groupBy("user_id", "event_type").applyInPandasWithState(
        fn,
        outputStructType=GAP_SCHEMA,
        stateStructType=_GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_interarrival_available_now(
        spark, sf_dir: str,
        table_name: str = "stream_gaps") -> DataFrame:
    """Drain the events stream once through the stateful gap emitter
    into a memory sink; returns the per-event gaps."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (interarrival_stateful(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


def _assert_single_batch(q) -> None:
    """Guard for drains whose emitted rows are only globally correct
    when the availableNow drain ran as ONE micro-batch (ADVICE r11:
    first_seen emits once per user, so a multi-batch drain could pin a
    non-global first_day if a later file held an earlier timestamp).
    Holds today because each sf dir is one parquet file under the
    default maxFilesPerTrigger; this makes the assumption explicit
    instead of implicit in a certified oracle."""
    p = q.lastProgress
    if p is not None and int(p.get("batchId", 0) or 0) > 0:
        raise RuntimeError(
            "availableNow drain ran %d micro-batches; this operator's "
            "exactly-once emission is only globally correct for a "
            "single-batch drain (set maxFilesPerTrigger >= file count "
            "or use the batch twin)" % (int(p["batchId"]) + 1))


BURST_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("burst", T.LongType()),
])

_BURST_STATE_SCHEMA = T.StructType([
    T.StructField("cur_minute", T.LongType()),
    T.StructField("cur_count", T.LongType()),
    T.StructField("max_burst", T.LongType()),
])


def burst_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of the `events_burst_flag_audit` peak detector:
    per user the state is THREE int64s — the minute bucket currently
    being counted, its running count, and the max events-per-minute
    seen so far — so an unbounded stream gets rate-limit/abuse
    screening with O(active users) state, never a (user, minute)
    keyed store that grows with stream length.

    Each micro-batch emits the user's refreshed peak (append mode);
    under an availableNow drain of a static snapshot (one batch) that
    is exactly one row per user, equal to the batch
    MAX-over-(user, minute) aggregate — the `topk_stateful`
    single-drain determinism argument. Minutes that straddle
    micro-batches merge correctly because the open bucket rides the
    state."""
    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(["ms", "event_id"])
        if state.exists:
            cur_minute, cur_count, max_burst = (
                int(state.get[0]), int(state.get[1]), int(state.get[2]))
        else:
            cur_minute, cur_count, max_burst = None, 0, 0
        for ms in pdf["ms"]:
            minute = int(ms) // 60000
            if minute == cur_minute:
                cur_count += 1
            else:
                if cur_minute is not None:
                    max_burst = max(max_burst, cur_count)
                cur_minute, cur_count = minute, 1
        max_burst = max(max_burst, cur_count)
        state.update((cur_minute, cur_count, max_burst))
        yield pd.DataFrame({"user_id": [user_id],
                            "burst": [max_burst]})

    from pyspark.sql import functions as F

    base = events.select("user_id", F.unix_millis("ts").alias("ms"),
                         "event_id")
    return base.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=BURST_SCHEMA,
        stateStructType=_BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_burst_available_now(
        spark, sf_dir: str,
        table_name: str = "stream_bursts") -> DataFrame:
    """Drain the events stream once through the stateful peak counter
    into a memory sink. A SINGLE-batch drain emits exactly one
    (user_id, burst) row per user; a multi-batch drain emits one
    refreshed-peak row per (user, batch) — peaks are monotone
    non-decreasing across batches, so callers that need one row per
    user take MAX(burst) per user over this output (the registry twin
    does exactly that)."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (burst_stateful(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


FIRST_SEEN_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("first_day", T.LongType()),
])

_FIRST_SEEN_STATE_SCHEMA = T.StructType([
    T.StructField("first_day", T.LongType()),
])


def first_seen_stateful(events: DataFrame) -> DataFrame:
    """Streaming first-touch detector: per user the state is ONE int64
    — the epoch-day of their first event — and a (user, first_day) row
    emits exactly ONCE, when the user is first seen (later batches
    emit nothing for known users). The streaming building block of
    growth accounting: the drained output feeds the same
    new-users-per-day → running-sum rollup as the batch
    `events_cumulative_users`, whose oracle the registry twin shares
    verbatim. O(known users) state, one int64 each — the minimal
    identity-dedup state any unbounded new-user metric needs."""
    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        if state.exists:
            return
        pdf = pd.concat(frames)
        state.update((int(pdf["d"].min()),))
        yield pd.DataFrame({"user_id": [user_id],
                            "first_day": [int(pdf["d"].min())]})

    from pyspark.sql import functions as F

    base = events.select("user_id",
                         F.expr("unix_millis(ts) div 86400000").alias("d"))
    return base.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_FIRST_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_first_seen_available_now(
        spark, sf_dir: str,
        table_name: str = "stream_first_seen") -> DataFrame:
    """Drain the events stream once through the first-touch detector
    into a memory sink; returns one (user_id, first_day) row per
    distinct user."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (first_seen_stateful(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # first_seen emits ONCE per user, so no batch-side rollup can
    # repair an out-of-order multi-batch drain — fail loudly instead.
    _assert_single_batch(q)
    return spark.table(table_name)


BIGRAM_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("next_type", T.StringType()),
    T.StructField("n", T.LongType()),
])

_BIGRAM_STATE_SCHEMA = T.StructType([
    T.StructField("last_ms", T.LongType()),
    T.StructField("last_eid", T.LongType()),
    T.StructField("last_type", T.StringType()),
])


def bigram_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of the `events_bigram_transitions` transition
    counter: per user the state is the LAST event seen — (ms,
    event_id, type), two int64s and one small string — so an unbounded
    stream keeps counting which-event-follows-which with O(active
    users) state; the transition matrix itself never lives in state
    (it is the downstream aggregation's job).

    Each micro-batch emits the batch's per-user (from, to, n) partial
    counts, with the state row prepended so transitions that straddle
    a batch boundary are counted exactly once, by the batch that sees
    the LATER event. Summing the partials per (from, to) after the
    drain therefore equals the batch lead()-over-(ts, event_id)
    transition counts at ANY micro-batch slicing, provided each
    user's events arrive time-ordered ACROSS batches (within a batch
    the order is restored locally) — the same cross-batch ordering
    contract the burst/EWMA twins document."""
    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(["ms", "event_id"])
        types = pdf["event_type"].tolist()
        if state.exists:
            prev = [str(state.get[2])]
        else:
            prev = []
        seq = prev + types
        counts: dict[tuple[str, str], int] = {}
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        last = pdf.iloc[-1]
        state.update((int(last["ms"]), int(last["event_id"]),
                      str(last["event_type"])))
        if counts:
            ks = sorted(counts)
            yield pd.DataFrame({
                "event_type": [k[0] for k in ks],
                "next_type": [k[1] for k in ks],
                "n": [counts[k] for k in ks],
            })

    from pyspark.sql import functions as F

    base = events.select("user_id", F.unix_millis("ts").alias("ms"),
                         "event_id", "event_type")
    return base.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=BIGRAM_SCHEMA,
        stateStructType=_BIGRAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_bigram_available_now(
        spark, sf_dir: str,
        table_name: str = "stream_bigrams") -> DataFrame:
    """Drain the events stream once through the stateful transition
    counter into a memory sink. Partial (from, to, n) counts sum to
    the exact batch transition matrix at any micro-batch slicing (see
    `bigram_stateful`); callers aggregate SUM(n) per pair over this
    output."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (bigram_stateful(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


DRAWDOWN_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("max_drawdown_cents", T.LongType()),
    T.StructField("peak_cents", T.LongType()),
])

_DRAWDOWN_STATE_SCHEMA = T.StructType([
    T.StructField("cum", T.LongType()),
    T.StructField("peak", T.LongType()),
    T.StructField("maxdd", T.LongType()),
])


def drawdown_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of the `events_max_drawdown` trajectory
    statistic: per user the state is THREE int64s — running total,
    running peak, max drawdown so far — so an unbounded value stream
    gets the roughness screen with O(active users) state and exact
    cents arithmetic (the DECIMAL cents cast happens JVM-side BEFORE
    the pandas function: pandas double·100 would round differently).

    Each micro-batch emits the user's refreshed (maxdd, peak); both
    are monotone non-decreasing across batches, so a MAX-per-user
    rollup over the drained output equals the batch windows at any
    micro-batch slicing (the burst_stateful determinism argument),
    under the same cross-batch per-user time-ordering contract."""
    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(["ms", "event_id"])
        if state.exists:
            cum, peak, maxdd = (int(state.get[0]), int(state.get[1]),
                                int(state.get[2]))
        else:
            cum, peak, maxdd = 0, -(1 << 62), 0
        for cents in pdf["cents"]:
            cum += int(cents)
            if cum > peak:
                peak = cum
            if peak - cum > maxdd:
                maxdd = peak - cum
        state.update((cum, peak, maxdd))
        yield pd.DataFrame({"user_id": [user_id],
                            "max_drawdown_cents": [maxdd],
                            "peak_cents": [peak]})

    from pyspark.sql import functions as F

    base = (events.filter(F.col("value").isNotNull())
            .select("user_id", F.unix_millis("ts").alias("ms"),
                    "event_id",
                    F.expr("CAST(CAST(value AS DECIMAL(20,2)) * 100 "
                           "AS BIGINT)").alias("cents")))
    return base.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=DRAWDOWN_SCHEMA,
        stateStructType=_DRAWDOWN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_drawdown_available_now(
        spark, sf_dir: str,
        table_name: str = "stream_drawdown") -> DataFrame:
    """Drain the events stream once through the stateful drawdown
    tracker into a memory sink; callers take MAX per user over the
    (monotone) emissions."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (drawdown_stateful(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


GAP_STATS_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("s1", T.LongType()),
    T.StructField("s2", T.LongType()),
])

_GAP_STATS_STATE_SCHEMA = T.StructType([
    T.StructField("last_ms", T.LongType()),
    T.StructField("last_eid", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("s1", T.LongType()),
    T.StructField("s2", T.LongType()),
])


def gap_stats_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of `events_burstiness_index`'s sufficient
    statistics: per event type the state is FIVE int64s — the last
    seen (ms, event_id) plus the gap count and its first two raw
    moments (n, Σg, Σg²) — so an unbounded event stream keeps the
    exact burstiness inputs with O(|types|) state. The boundary gap
    between micro-batches is counted exactly once by the later batch
    (the bigram_stateful cross-batch argument); within a batch rows
    fold in (ms, event_id) order, matching the batch lead() window.

    Emissions are the refreshed (n, s1, s2) per batch — all three
    MONOTONE non-decreasing — so a MAX-per-type rollup over the
    drained output equals the batch aggregate at any micro-batch
    slicing; the burstiness doubles are computed AFTER the rollup
    with the identical staged expressions, keeping the streaming
    entry on the batch entry's oracle verbatim."""
    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(["ms", "event_id"])
        if state.exists:
            last_ms, last_eid, n, s1, s2 = (int(x) for x in state.get)
            have_last = True
        else:
            last_ms = last_eid = n = s1 = s2 = 0
            have_last = False
        for ms, eid in zip(pdf["ms"], pdf["event_id"]):
            ms = int(ms)
            if have_last:
                # Exactness and the MAX-rollup's monotone-emission
                # property both assume micro-batches arrive in
                # per-key event-time order (the standing
                # bigram/drawdown source assumption). An event OLDER
                # than the stored last_ms would fold a negative gap
                # and silently diverge s1/s2 from the batch lead()
                # twin — fail loudly instead (ADVICE r14).
                if ms < last_ms:
                    raise ValueError(
                        f"gap_stats_stateful: out-of-order event for "
                        f"key {event_type!r} (ms={ms} < stored "
                        f"last_ms={last_ms}); the source must deliver "
                        f"per-key event-time-ordered micro-batches")
                gap = ms - last_ms
                n += 1
                s1 += gap
                s2 += gap * gap
            last_ms, last_eid, have_last = ms, int(eid), True
        state.update((last_ms, last_eid, n, s1, s2))
        yield pd.DataFrame({"event_type": [event_type],
                            "n": [n], "s1": [s1], "s2": [s2]})

    from pyspark.sql import functions as F

    base = events.select("event_type", F.unix_millis("ts").alias("ms"),
                         "event_id")
    return base.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=GAP_STATS_SCHEMA,
        stateStructType=_GAP_STATS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_gap_stats_available_now(
        spark, sf_dir: str,
        table_name: str = "stream_gap_stats") -> DataFrame:
    """Drain the events stream once through the stateful gap tracker
    into a memory sink; callers take MAX per type over the (monotone)
    emissions."""
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        read_events_stream,
    )

    q = (gap_stats_stateful(read_events_stream(spark, sf_dir))
         .writeStream.format("memory").queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)
