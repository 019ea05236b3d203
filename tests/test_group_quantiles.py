"""exact_group_quantiles (operators/quality.py): type-1 quantile
selection, median agreement, validation, and the staged round-6
`agg_exact_quantiles` DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import (
    exact_group_quantiles,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _df(spark, vals):
    return spark.createDataFrame(
        [("g", float(v)) for v in vals], "k string, v double")


def test_hand_computed_quartiles(spark):
    # 10 values 1..10: p25 -> rank ceil(2.5)=3 -> 3; p50 -> 5; p75 -> 8
    d = _df(spark, range(1, 11))
    got = {r["q_ppm"]: r["quantile"]
           for r in exact_group_quantiles(d, "k", "v").collect()}
    assert got == {250_000: 3.0, 500_000: 5.0, 750_000: 8.0}


def test_p100_is_max_p_small_is_min(spark):
    d = _df(spark, [7, 3, 9])
    got = {r["q_ppm"]: r["quantile"]
           for r in exact_group_quantiles(
               d, "k", "v", q_ppm=[1, 1_000_000]).collect()}
    assert got == {1: 3.0, 1_000_000: 9.0}


def test_lower_median_on_even_n(spark):
    # type-1 p50 of 4 values = 2nd (lower median), a data member
    d = _df(spark, [1, 2, 3, 4])
    got = exact_group_quantiles(d, "k", "v",
                                q_ppm=[500_000]).collect()[0]
    assert got["quantile"] == 2.0


def test_single_value_all_levels(spark):
    d = _df(spark, [42])
    rows = exact_group_quantiles(d, "k", "v").collect()
    assert len(rows) == 3
    assert all(r["quantile"] == 42.0 for r in rows)


def test_invalid_levels_raise(spark):
    d = _df(spark, [1])
    with pytest.raises(ValueError):
        exact_group_quantiles(d, "k", "v", q_ppm=[])
    with pytest.raises(ValueError):
        exact_group_quantiles(d, "k", "v", q_ppm=[0])
    with pytest.raises(ValueError):
        exact_group_quantiles(d, "k", "v", q_ppm=[1_000_001])


def test_one_row_per_key_per_level(spark):
    d = spark.createDataFrame(
        [(str(k % 5), float(v)) for k in range(5) for v in range(37)],
        "k string, v double")
    out = exact_group_quantiles(d, "k", "v")
    assert out.count() == 15
    assert out.groupBy("k").count().filter("count != 3").count() == 0


_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(row_number() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_extendedprice) AS BIGINT)
           AS rn,
         CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
           AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
fanned AS (
  SELECT l_returnflag, v, rn, n, q.q_ppm
  FROM ranked,
       (VALUES (CAST(250000 AS BIGINT)), (500000), (950000))
         AS q(q_ppm))
SELECT l_returnflag, q_ppm, v AS quantile
FROM fanned
WHERE rn = (n * q_ppm + 999999) // 1000000
"""


def test_group_quantiles_duckdb_parity(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = exact_group_quantiles(li, "l_returnflag", "l_extendedprice",
                                q_ppm=[250_000, 500_000, 950_000])
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() == 9  # 3 flags x 3 levels
