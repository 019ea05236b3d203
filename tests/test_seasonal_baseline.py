"""seasonal_baseline (operators/timeseries.py): slot-mean semantics,
residual exactness, and the staged round-6 `events_seasonal_baseline`
DuckDB oracle (Spark dayofweek = DuckDB dayofweek + 1), proven BEFORE
registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.timeseries import (
    seasonal_baseline,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double")


def test_same_slot_mean_and_residual(spark):
    # two Mondays 05:xx -> same (dow, hour) slot, mean 15, residuals ±5
    rows = [(1, "2024-01-08 05:10:00", 10.0),
            (2, "2024-01-15 05:40:00", 20.0),
            (3, "2024-01-08 07:00:00", 99.0)]
    d = spark.createDataFrame(rows, "event_id long, ts string, value double") \
        .selectExpr("event_id", "cast(ts as timestamp) ts", "value")
    got = {r.event_id: (r.baseline_mean, r.baseline_residual)
           for r in seasonal_baseline(d, "ts", "value").collect()}
    assert got[1] == (15.0, -5.0)
    assert got[2] == (15.0, 5.0)
    assert got[3] == (99.0, 0.0)  # singleton slot: mean is itself


def test_group_columns_partition_profile(spark):
    rows = [(1, "2024-01-08 05:00:00", 10.0, "a"),
            (2, "2024-01-08 05:00:00", 30.0, "b")]
    d = spark.createDataFrame(
        rows, "event_id long, ts string, value double, g string") \
        .selectExpr("event_id", "cast(ts as timestamp) ts", "value", "g")
    got = {r.event_id: r.baseline_mean
           for r in seasonal_baseline(
               d, "ts", "value", group_cols=["g"]).collect()}
    assert got == {1: 10.0, 2: 30.0}


def test_null_values_pass_through(spark):
    rows = [(1, "2024-01-08 05:00:00", 10.0),
            (2, "2024-01-08 05:30:00", None)]
    d = spark.createDataFrame(
        rows, "event_id long, ts string, value double") \
        .selectExpr("event_id", "cast(ts as timestamp) ts", "value")
    got = {r.event_id: (r.baseline_mean, r.baseline_residual)
           for r in seasonal_baseline(d, "ts", "value").collect()}
    assert got[1] == (10.0, 0.0)      # NULL row excluded from the mean
    assert got[2][1] is None


_ORACLE = """
WITH keyed AS (
  SELECT event_id, event_type, value,
         dayofweek(ts) + 1 AS dow, hour(ts) AS hod
  FROM events),
prof AS (
  SELECT event_type, dow, hod,
         CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS baseline_mean
  FROM keyed WHERE value IS NOT NULL
  GROUP BY 1, 2, 3)
SELECT k.event_id, k.event_type, k.value, p.baseline_mean,
       k.value - p.baseline_mean AS baseline_residual
FROM keyed k
LEFT JOIN prof p USING (event_type, dow, hod)
"""


def test_seasonal_baseline_duckdb_parity(spark):
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("event_id", "event_type", "ts", "value")
    got = (seasonal_baseline(ev, "ts", "value",
                             group_cols=["event_type"])
           .select("event_id", "event_type", "value",
                   "baseline_mean", "baseline_residual"))
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
