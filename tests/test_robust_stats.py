"""Exact-median / MAD robust outlier family (operators/quality.py):
behavioral guarantees plus the staged round-6 `events_mad_outliers`
DuckDB oracle, proven bit-identical BEFORE registration (the PQ/CMS
staging pattern)."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import (
    exact_group_median,
    mad_outliers,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def test_exact_median_odd_and_even_groups(spark):
    rows = ([("odd", float(x)) for x in (5, 1, 9, 3, 7)]
            + [("even", float(x)) for x in (4, 1, 3, 2)])
    got = {r["k"]: r["median"]
           for r in exact_group_median(_df(spark, rows), "k", "v").collect()}
    assert got["odd"] == statistics.median([5, 1, 9, 3, 7])
    assert got["even"] == statistics.median([4, 1, 3, 2])


def test_exact_median_ignores_nulls_and_all_null_keys(spark):
    rows = [("a", 1.0), ("a", None), ("a", 3.0), ("gone", None)]
    got = {r["k"]: r["median"]
           for r in exact_group_median(_df(spark, rows), "k", "v").collect()}
    assert got == {"a": 2.0}


def test_median_is_partitioning_invariant(spark):
    rows = [("k", float(x)) for x in range(100, 0, -1)]
    base = _df(spark, rows)
    a = exact_group_median(base.repartition(1), "k", "v").collect()
    b = exact_group_median(base.repartition(13, "v"), "k", "v").collect()
    assert a == b == [("k", 50.5)]


def test_mad_outliers_flags_spike_not_bulk(spark):
    rows = [("k", float(x)) for x in (10, 11, 12, 10, 11, 12, 11, 1000)]
    out = mad_outliers(_df(spark, rows), "k", "v", k=3.0).collect()
    flagged = [r["v"] for r in out if r["is_outlier"]]
    assert flagged == [1000.0]
    one = [r for r in out if r["v"] == 1000.0][0]
    assert one["median"] == 11.0 and one["mad"] == 1.0
    assert one["robust_z"] == 989.0


def test_mad_outliers_constant_key_has_no_scale(spark):
    rows = [("c", 5.0)] * 4
    out = mad_outliers(_df(spark, rows), "k", "v").collect()
    assert all(r["mad"] == 0.0 and r["robust_z"] is None
               and not r["is_outlier"] for r in out)


# Staged round-6 oracle for `events_mad_outliers` (events table:
# key=event_type, value=value, k=3): outlier rows with their robust
# stats. `// 2` is DuckDB integer division == Spark's `div`.
_ORACLE = """
WITH vals AS (
  SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL),
r1 AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM vals),
med AS (
  SELECT event_type, SUM(value) / COUNT(*) AS median
  FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
base AS (
  SELECT v.event_id, v.event_type, v.value, m.median,
         abs(v.value - m.median) AS abs_dev
  FROM vals v JOIN med m USING (event_type)),
r2 AS (
  SELECT event_type, abs_dev,
         row_number() OVER (PARTITION BY event_type ORDER BY abs_dev) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base),
mad AS (
  SELECT event_type, SUM(abs_dev) / COUNT(*) AS mad
  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1)
SELECT b.event_id, b.event_type, b.value, b.median, d.mad,
       (b.value - b.median) / d.mad AS robust_z
FROM base b JOIN mad d USING (event_type)
WHERE d.mad > 0 AND b.abs_dev > 3.0 * d.mad
"""


def test_mad_outliers_duckdb_parity(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    got = (mad_outliers(ev, "event_type", "value", k=3.0)
           .filter("is_outlier")
           .select("event_id", "event_type", "value",
                   "median", "mad", "robust_z"))
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0, "fixture produced no outliers - weak test"
