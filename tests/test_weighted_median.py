"""weighted_group_median (operators/quality.py): exact lower weighted
median semantics + the staged round-6 `agg_weighted_median` DuckDB
oracle, proven BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import (
    weighted_group_median,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v double, w long")


def test_known_weighted_median(spark):
    # k=a: values 1(w3), 2(w1), 10(w2) -> tot 6, half 3 -> cum(1)=3
    # crosses (2*3 >= 6), so lower weighted median = 1.0
    d = _df(spark, [("a", 1.0, 3), ("a", 2.0, 1), ("a", 10.0, 2)])
    got = {r["k"]: r["wmedian"]
           for r in weighted_group_median(d, "k", "v", "w").collect()}
    assert got == {"a": 1.0}


def test_equal_weights_match_lower_median(spark):
    # unit weights reduce to the plain lower median: 4 values -> 2nd
    d = _df(spark, [("a", float(v), 1) for v in (4, 1, 3, 2)])
    got = weighted_group_median(d, "k", "v", "w").collect()
    assert got[0]["wmedian"] == 2.0


def test_tie_values_collapse(spark):
    # duplicate values merge their weights before ranking
    d = _df(spark, [("a", 5.0, 1), ("a", 5.0, 1), ("a", 1.0, 1)])
    got = weighted_group_median(d, "k", "v", "w").collect()
    assert got[0]["wmedian"] == 5.0


def test_null_and_nonpositive_weights_excluded(spark):
    d = _df(spark, [("a", 1.0, 0), ("a", 2.0, -5), ("a", 3.0, 1),
                    ("a", None, 9), ("b", 1.0, 0)])
    rows = weighted_group_median(d, "k", "v", "w").collect()
    assert {r["k"]: r["wmedian"] for r in rows} == {"a": 3.0}


def test_one_row_per_key(spark):
    d = _df(spark, [(str(k), float(v), (v % 3) + 1)
                    for k in range(5) for v in range(1, 20)])
    out = weighted_group_median(d, "k", "v", "w")
    assert out.count() == 5
    assert out.select("k").distinct().count() == 5


_ORACLE = """
WITH grp AS (
  SELECT l_returnflag, l_extendedprice AS v,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND CAST(l_quantity AS BIGINT) > 0
  GROUP BY 1, 2),
c AS (
  SELECT l_returnflag, v, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS totw
  FROM grp)
SELECT l_returnflag, v AS wmedian FROM c
WHERE 2 * cumw >= totw AND 2 * (cumw - w) < totw
"""


def test_weighted_median_duckdb_parity(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = weighted_group_median(
        li, "l_returnflag", "l_extendedprice", "l_quantity")
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() == 3  # A/N/R flags all present in the fixture


def test_weighted_median_vs_exact_expansion(spark):
    # ground truth by brute force: repeat each value `w` times, take
    # the lower median of the expanded multiset
    import math

    rows = [("g", float(v), int(w))
            for v, w in ((7, 2), (3, 5), (9, 1), (5, 4))]
    d = _df(spark, rows)
    expanded = sorted(v for _, v, w in rows for _ in range(w))
    lower = expanded[math.ceil(len(expanded) / 2) - 1]
    got = weighted_group_median(d, "k", "v", "w").collect()[0]["wmedian"]
    assert got == lower
