"""Theil–Sen robust slope (operators/timeseries.py::theil_sen_slope):
robustness semantics, the enforced quadratic cap, and the staged
round-6 `events_theil_sen` DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.timeseries import theil_sen_slope
from yougile_etl_pipeline_spark.sources.tables import load_table


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_clean_linear_series_recovers_slope(spark):
    # v = 2*t(sec) + 5  ->  slope 2 per second = 2e-6 per microsecond
    rows = [("a", _ts(i), 2.0 * i + 5.0) for i in range(10)]
    [r] = theil_sen_slope(_df(spark, rows), "k", "ts", "v").collect()
    assert r["n_pairs"] == 45
    assert r["sen_slope"] == pytest.approx(2e-6, rel=1e-12)


def test_outlier_cannot_move_the_slope(spark):
    rows = [("a", _ts(i), 1.0 * i) for i in range(11)]
    rows[5] = ("a", _ts(5), 1e9)            # one wild point
    [r] = theil_sen_slope(_df(spark, rows), "k", "ts", "v").collect()
    # least squares would be dragged to ~1e7; the median slope holds
    assert r["sen_slope"] == pytest.approx(1e-6, rel=1e-9)


def test_quadratic_cap_is_enforced(spark):
    rows = [("a", _ts(i), float(i)) for i in range(30)]
    with pytest.raises(ValueError, match="max_rows_per_key"):
        theil_sen_slope(_df(spark, rows), "k", "ts", "v",
                        max_rows_per_key=10)


def test_single_row_and_duplicate_time_keys_yield_no_row(spark):
    rows = [("one", _ts(0), 1.0),
            ("dup", _ts(0), 1.0), ("dup", _ts(0), 2.0)]
    assert theil_sen_slope(_df(spark, rows), "k", "ts", "v").collect() \
        == []


# Staged round-6 oracle: per-user Theil–Sen slope of event values over
# time (users are small at any SF — the cap holds by fixture design).
_ORACLE = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS t, CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL),
pairs AS (
  SELECT a.user_id,
         (b.v - a.v) / CAST(b.t - a.t AS DOUBLE) AS slope
  FROM base a JOIN base b
    ON a.user_id = b.user_id AND a.t < b.t),
r AS (
  SELECT user_id, slope,
         row_number() OVER (PARTITION BY user_id ORDER BY slope) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM pairs),
med AS (
  SELECT user_id, SUM(slope) / COUNT(*) AS sen_slope
  FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
cnt AS (SELECT user_id, count(*) AS n_pairs FROM pairs GROUP BY 1)
SELECT c.user_id, c.n_pairs, m.sen_slope
FROM cnt c JOIN med m USING (user_id)
"""


def test_theil_sen_duckdb_parity(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = theil_sen_slope(ev, "user_id", "ts", "value",
                          max_rows_per_key=5000)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0
