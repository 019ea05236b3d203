"""ABC revenue classification (operators/quality.py::abc_analysis).

Classic warehouse Pareto banding: parts ranked by revenue, A = first
80% of cumulative revenue, B = next 15%, C = tail. Originally proven
here as a round-7 bank entry with an honestly-flagged unpartitioned
ranking window; reworked per VERDICT r05 #6 into bucket-partitioned
ranking (approx-cut buckets + per-bucket offsets) with bit-identical
output, and registered at round 6."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.sources.tables import load_table


from yougile_etl_pipeline_spark.operators.quality import abc_analysis as _abc


def abc_analysis(lineitem, **kw):
    return _abc(lineitem, "l_partkey", "l_extendedprice", **kw)


_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS r
  FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(r) AS t FROM rev),
ranked AS (
  SELECT l_partkey, r, t,
         SUM(r) OVER (ORDER BY r DESC, l_partkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(row_number() OVER (ORDER BY r DESC, l_partkey)
              AS BIGINT) AS rank
  FROM rev CROSS JOIN tot)
SELECT l_partkey, rank,
       CAST(r AS DOUBLE) AS revenue,
       CAST(cum AS DOUBLE) AS cum_revenue,
       CASE WHEN cum * 1000000 <= t * 800000 THEN 'A'
            WHEN cum * 1000000 <= t * 950000 THEN 'B'
            ELSE 'C' END AS abc_band
FROM ranked
"""


def test_abc_hand_case(spark):
    # revenues 50, 30, 15, 5 (total 100): cum shares 50/80/95/100
    # -> A (<=80), A, B (<=95), C
    rows = [(k, 1, float(v)) for k, v in
            ((1, 50), (2, 30), (3, 15), (4, 5))]
    li = spark.createDataFrame(
        rows, "l_partkey long, l_linenumber int, l_extendedprice double")
    got = {r["l_partkey"]: r["abc_band"]
           for r in abc_analysis(li).collect()}
    assert got == {1: "A", 2: "A", 3: "B", 4: "C"}


def test_rank_follows_revenue_then_key(spark):
    rows = [(1, 1, 10.0), (2, 1, 10.0), (3, 1, 20.0)]
    li = spark.createDataFrame(
        rows, "l_partkey long, l_linenumber int, l_extendedprice double")
    got = {r["l_partkey"]: r["rank"]
           for r in abc_analysis(li).collect()}
    assert got == {3: 1, 1: 2, 2: 3}  # tie broken by partkey


def test_abc_duckdb_parity(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = abc_analysis(li)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    bands = {r["abc_band"] for r in
             got.select("abc_band").distinct().collect()}
    assert bands == {"A", "B", "C"}


def test_abc_ranking_is_bucket_partitioned(spark):
    """The VERDICT r05 #6 contract: no full-catalog single-task sort.
    The main ranking window must run partitioned by the revenue-range
    bucket; the only single-partition exchanges allowed are the 1-row
    stat aggregate and the <= `buckets`-row offset window."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    plan = abc_analysis(li)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
             .fromString("formatted"))
    assert "hashpartitioning(__bid" in plan, (
        "bucket-partitioned ranking window lost — the part catalog "
        "is being ranked in one task again")
    body = plan.split("\n\n")[0]
    assert body.count("Exchange SinglePartition") <= 2, body


def test_abc_many_buckets_parity(spark):
    # stitching must be exact for any bucket count, including more
    # buckets than distinct revenues
    rows = [(k, 1, float(v)) for k, v in
            ((1, 50), (2, 30), (3, 15), (4, 5))]
    li = spark.createDataFrame(
        rows, "l_partkey long, l_linenumber int, l_extendedprice double")
    got = {r["l_partkey"]: (r["rank"], r["abc_band"])
           for r in abc_analysis(li, buckets=16).collect()}
    assert got == {1: (1, "A"), 2: (2, "A"), 3: (3, "B"), 4: (4, "C")}
