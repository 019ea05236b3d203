"""benford_profile (operators/quality.py): digit extraction, spine
completeness, ppm arithmetic + the staged round-6 `quality_benford`
DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import (
    _BENFORD_PPM,
    benford_profile,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def test_digit_extraction_and_counts(spark):
    d = spark.createDataFrame(
        [(1.5,), (19.0,), (190.0,), (2.0,), (900.0,), (0.5,), (None,)],
        "v double")
    rows = {r["digit"]: r["n_values"]
            for r in benford_profile(d, "v").collect()}
    # 1.5, 19, 190 -> digit 1; 2 -> 2; 900 -> 9; 0.5 and NULL excluded
    assert rows[1] == 3 and rows[2] == 1 and rows[9] == 1
    assert sum(rows.values()) == 5


def test_spine_always_nine_rows(spark):
    d = spark.createDataFrame([(1.0,)], "v double")
    out = benford_profile(d, "v").collect()
    assert len(out) == 9
    zero = {r["digit"]: r for r in out if r["digit"] != 1}
    assert all(r["n_values"] == 0 and r["obs_ppm"] == 0
               for r in zero.values())


def test_ppm_arithmetic_exact(spark):
    # 3 values: two 1s, one 2 -> obs_ppm = 666666 / 333333 (int div)
    d = spark.createDataFrame([(1.0,), (12.0,), (2.0,)], "v double")
    rows = {r["digit"]: r for r in benford_profile(d, "v").collect()}
    assert rows[1]["obs_ppm"] == 666666
    assert rows[2]["obs_ppm"] == 333333
    assert rows[1]["dev_ppm"] == 666666 - _BENFORD_PPM[1]


def test_benford_constants_sum_to_one(spark):
    # the expected shares are a probability distribution (ppm rounding
    # leaves them summing to exactly 1e6 for this constant set)
    assert sum(_BENFORD_PPM.values()) == 1_000_000


_EXPECTED_VALUES = ", ".join(
    f"({d}, {p})" for d, p in
    [(1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
     (6, 66947), (7, 57992), (8, 51153), (9, 45757)])

_ORACLE = f"""
WITH base AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1),
obs AS (SELECT digit, count(*) AS n_values FROM base GROUP BY 1),
tot AS (SELECT count(*) AS t FROM base),
spine AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
expd AS (SELECT * FROM (VALUES {_EXPECTED_VALUES})
         AS e(digit, exp_ppm))
SELECT s.digit,
       COALESCE(o.n_values, 0) AS n_values,
       COALESCE(o.n_values, 0) * 1000000 // greatest(t.t, 1)
         AS obs_ppm,
       CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
       COALESCE(o.n_values, 0) * 1000000 // greatest(t.t, 1)
         - e.exp_ppm AS dev_ppm
FROM spine s
LEFT JOIN obs o USING (digit)
JOIN expd e USING (digit)
CROSS JOIN tot t
"""


def test_benford_duckdb_parity(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    got = benford_profile(orders, "o_totalprice")
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    # money totals are Benford-ish but the assert here is only that
    # every digit row exists and counts are positive somewhere
    assert got.agg(F.sum("n_values")).collect()[0][0] > 0
