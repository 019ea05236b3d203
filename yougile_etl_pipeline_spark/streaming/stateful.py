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

__all__ = ["sessionize_stateful", "SESSION_SCHEMA"]

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
