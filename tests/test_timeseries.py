"""Fixed-point EWMA (operators/timeseries.py): hand-checked recurrence,
partitioning invariance, and the DuckDB recursive-CTE differential —
the staged round-6 oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.timeseries import (
    ewma_fixed_point,
)


def test_ewma_hand_computed(spark):
    # alpha=1/4, S=10^6, cents scale: x = [100, 200, 100] (1.00, 2.00,
    # 1.00): s1=100e6; s2=(200e6+3*100e6)/4=125e6; s3=(100e6+3*125e6)
    # /4=118.75e6 -> ewma = 1.0, 1.25, 1.1875
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 1.0)],
        "user_id long, event_id long, value double")
    out = {r.event_id: r.ewma for r in ewma_fixed_point(
        df, "user_id", ["event_id"], "value").collect()}
    assert out == {1: 1.0, 2: 1.25, 3: 1.1875}


def test_ewma_partitioning_invariant(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet") \
        .select("user_id", "ts", "event_id", "value")
    base = lambda d: {(r.user_id, r.event_id): r.ewma  # noqa: E731
                      for r in ewma_fixed_point(
                          d, "user_id", ["ts", "event_id"],
                          "value").collect()}
    a = base(ev.coalesce(1))
    b = base(ev.repartition(19))
    assert a == b and len(a) > 0


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame([(1, 1, 1.0)],
                               "user_id long, event_id long, value double")
    with pytest.raises(ValueError):
        ewma_fixed_point(df, "user_id", ["event_id"], "value",
                         alpha_num=4, alpha_den=4)


def test_ewma_matches_duckdb_recursive_cte(spark):
    # the staged r06 oracle: same integer recurrence as a recursive
    # CTE walking rn -> rn+1 per user. Output keyed on (user_id,
    # event_id) with the one final IEEE division on both sides.
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet") \
        .select("user_id", "ts", "event_id", "value")
    out = (ewma_fixed_point(ev, "user_id", ["ts", "event_id"], "value")
           .select("user_id", "event_id", "ewma"))
    sql = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
ew AS (
  SELECT user_id, event_id, rn, v * 1000000 AS s
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_id, n.rn,
         (1 * n.v * 1000000 + 3 * ew.s) // 4
  FROM ew JOIN seq n ON n.user_id = ew.user_id AND n.rn = ew.rn + 1)
SELECT user_id, event_id,
       CAST(s AS DOUBLE) / 100000000.0 AS ewma
FROM ew
"""
    con = duck_connect(SF_SMOKE)
    issues = compare(out, con, sql)
    assert not issues, issues


def test_ewma_converges_toward_constant_input(spark):
    # constant series: ewma equals the constant at every step, exactly
    df = spark.createDataFrame(
        [(1, i, 7.25) for i in range(1, 30)],
        "user_id long, event_id long, value double")
    out = [r.ewma for r in ewma_fixed_point(
        df, "user_id", ["event_id"], "value").collect()]
    assert all(math.isclose(v, 7.25, abs_tol=1e-9) for v in out)
