"""rolling_slope (operators/timeseries.py): hand-checked OLS slope,
NULL-denominator edge, partitioning invariance, and the staged
round-6 `events_rolling_slope` DuckDB window oracle, proven BEFORE
registration."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.timeseries import (
    rolling_slope,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _df(spark, vals):
    return spark.createDataFrame(
        [(1, i + 1, float(v)) for i, v in enumerate(vals)],
        "user_id long, event_id long, value double")


def test_perfect_line_recovers_slope(spark):
    # y = 3x + 1: every trailing window sees slope exactly 3
    out = rolling_slope(_df(spark, [4, 7, 10, 13, 16]), "user_id",
                        ["event_id"], "value", window_n=3)
    rows = sorted(out.collect(), key=lambda r: r.event_id)
    assert rows[0].slope is None          # single-row window
    assert all(r.slope == 3.0 for r in rows[1:])


def test_constant_series_zero_slope(spark):
    out = rolling_slope(_df(spark, [5, 5, 5, 5]), "user_id",
                        ["event_id"], "value", window_n=4)
    rows = sorted(out.collect(), key=lambda r: r.event_id)
    assert all(r.slope == 0.0 for r in rows[1:])


def test_window_cap_limits_lookback(spark):
    # flat for 10 rows then a jump: with window_n=2 the slope is the
    # last step only
    out = rolling_slope(_df(spark, [1] * 10 + [11]), "user_id",
                        ["event_id"], "value", window_n=2)
    last = max(out.collect(), key=lambda r: r.event_id)
    assert last.slope == 10.0 and last.n_window == 2


def test_hand_computed_lsq(spark):
    # x=[1,2,3], y(cents)=[100,200,400]: n=3 Sx=6 Sy=700 Sxy=1700
    # Sxx=14 -> num=5100-4200=900, den=42-36=6 -> 900/600 = 1.5
    out = rolling_slope(_df(spark, [1, 2, 4]), "user_id",
                        ["event_id"], "value", window_n=3)
    last = max(out.collect(), key=lambda r: r.event_id)
    assert last.slope == 1.5


def test_rejects_window_below_two(spark):
    with pytest.raises(ValueError):
        rolling_slope(_df(spark, [1]), "user_id", ["event_id"],
                      "value", window_n=1)


def test_partitioning_invariant(spark):
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("user_id", "ts", "event_id", "value")
    run = lambda d: {(r.user_id, r.event_id): r.slope  # noqa: E731
                     for r in rolling_slope(
                         d, "user_id", ["ts", "event_id"], "value",
                         window_n=10).collect()}
    a, b = run(ev.coalesce(1)), run(ev.repartition(17))
    assert a == b and len(a) > 0


_ORACLE = """
WITH base AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS y,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS x
  FROM events),
w AS (
  SELECT user_id, event_id,
         count(y) OVER win AS n_window,
         SUM(CASE WHEN y IS NOT NULL THEN x END) OVER win AS sx,
         SUM(y) OVER win AS sy,
         SUM(x * y) OVER win AS sxy,
         SUM(CASE WHEN y IS NOT NULL THEN x * x END) OVER win AS sxx
  FROM base
  WINDOW win AS (PARTITION BY user_id ORDER BY x
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, n_window,
       CASE WHEN n_window * sxx - sx * sx <> 0
            THEN CAST(n_window * sxy - sx * sy AS DOUBLE)
                 / CAST((n_window * sxx - sx * sx) * 100 AS DOUBLE)
       END AS slope
FROM w
"""


def test_rolling_slope_duckdb_parity(spark):
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("user_id", "ts", "event_id", "value")
    out = (rolling_slope(ev, "user_id", ["ts", "event_id"], "value",
                         window_n=10)
           .select("user_id", "event_id", "n_window", "slope"))
    con = duck_connect(SF_SMOKE)
    issues = compare(out, con, _ORACLE)
    assert not issues, issues


def test_null_values_excluded_from_all_window_terms(spark):
    # y = [10, NULL, 30] with window 3: the regression at row 3 must
    # use ONLY points (x=1, 10) and (x=3, 30) -> slope (30-10)/(3-1)
    d = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, None), (1, 3, 30.0)],
        "user_id long, event_id long, value double")
    out = {r.event_id: (r.n_window, r.slope) for r in rolling_slope(
        d, "user_id", ["event_id"], "value", window_n=3).collect()}
    assert out[3] == (2, 10.0)
    assert out[2] == (1, None)  # only one defined point in window
