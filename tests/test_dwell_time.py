"""Per-state dwell time (staged round-6 `events_dwell_time`): the gap
to the NEXT event attributed to the current event's type — classic
time-in-state telemetry. Oracle proven BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.sources.tables import load_table


def dwell_time(events):
    """One user-keyed window shuffle (lead); the (user, type)
    aggregation reuses rows already clustered by user. Gaps are exact
    microsecond int64 diffs; a user's LAST event has no next event
    and contributes nothing (NULL-skipped by SUM on both engines —
    a type whose only occurrences are stream-final rows reports NULL
    dwell with n_intervals 0)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros(F.lead("ts", 1).over(w))
           - F.unix_micros(F.col("ts")))
    g = events.withColumn("__gap_us", gap)
    return (g.groupBy("user_id", "event_type")
             .agg(F.sum("__gap_us").alias("dwell_us"),
                  F.count("__gap_us").alias("n_intervals")))


_ORACLE = """
WITH g AS (
  SELECT user_id, event_type,
         epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_type,
       CAST(SUM(gap_us) AS BIGINT) AS dwell_us,
       count(gap_us) AS n_intervals
FROM g GROUP BY 1, 2
"""


def test_dwell_hand_case(spark):
    rows = [(1, 1, "2024-01-01 00:00:00", "a"),
            (1, 2, "2024-01-01 00:00:10", "b"),
            (1, 3, "2024-01-01 00:00:40", "a")]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).selectExpr("user_id", "event_id", "cast(ts as timestamp) ts",
                 "event_type")
    got = {(r.user_id, r.event_type): (r.dwell_us, r.n_intervals)
           for r in dwell_time(ev).collect()}
    # 'a' holds 10s (first interval); final 'a' contributes nothing
    assert got[(1, "a")] == (10_000_000, 1)
    assert got[(1, "b")] == (30_000_000, 1)


def test_final_only_type_null_dwell(spark):
    rows = [(1, 1, "2024-01-01 00:00:00", "a"),
            (1, 2, "2024-01-01 00:01:00", "z")]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).selectExpr("user_id", "event_id", "cast(ts as timestamp) ts",
                 "event_type")
    got = {(r.user_id, r.event_type): (r.dwell_us, r.n_intervals)
           for r in dwell_time(ev).collect()}
    assert got[(1, "z")] == (None, 0)


def test_dwell_duckdb_parity(spark):
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("user_id", "ts", "event_id", "event_type")
    got = dwell_time(ev)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    assert got.count() > 0
