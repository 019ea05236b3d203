"""ABC revenue classification — ROUND-7 BANK: operator + oracle
proven here, deliberately NOT in registry_r06 (46/50 slots used;
r06 headroom reserved for recertifications). Classic warehouse
Pareto banding: parts ranked by revenue, A = first 80% of cumulative
revenue, B = next 15%, C = tail."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.sources.tables import load_table


def abc_analysis(lineitem, *, a_ppm: int = 800_000,
                 b_ppm: int = 950_000):
    """Pareto/ABC classification of parts by revenue share.

    Exactness: revenue sums are DECIMAL (order-free); the cumulative
    share test is pure integer-free DECIMAL comparison — band A iff
    cumrev·10⁶ ≤ total·a_ppm evaluated in DECIMAL (no division at
    all), ties broken by (revenue DESC, partkey) so the running order
    is total. Scale: one part-keyed partial agg, then ONE ranking
    window whose input is the PART dimension grain (not the fact),
    plus a 1-row broadcast total. The unpartitioned window is a
    single-task sort of |parts| rows — honest caveat, same family
    as the RFM cut pass; for catalogs beyond one task's memory,
    pre-bucket by a coarse revenue range (exact_kth_value cuts)
    and rank within buckets with per-bucket offsets."""
    rev = (lineitem.groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(24,6)"))
                .alias("__rev")))
    w = (Window.orderBy(F.col("__rev").desc(), F.col("l_partkey"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = rev.agg(F.sum("__rev").alias("__tot"))
    ranked = (rev.crossJoin(F.broadcast(tot))
              .withColumn("__cum", F.sum("__rev").over(w))
              .withColumn("rank", F.row_number().over(
                  Window.orderBy(F.col("__rev").desc(),
                                 F.col("l_partkey"))).cast("bigint")))
    band = (F.when(F.col("__cum") * 1_000_000
                   <= F.col("__tot") * a_ppm, "A")
            .when(F.col("__cum") * 1_000_000
                  <= F.col("__tot") * b_ppm, "B")
            .otherwise("C"))
    return ranked.select(
        "l_partkey", "rank",
        F.col("__rev").cast("double").alias("revenue"),
        F.col("__cum").cast("double").alias("cum_revenue"),
        band.alias("abc_band"))


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
