"""Cohort lifetime-value curve (staged round-6 `mart_cohort_ltv`):
cohort = first-order month per customer; age = months since cohort;
cumulative DECIMAL-exact revenue per (cohort, age). Oracle proven
BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.sources.tables import load_table


def cohort_ltv(orders):
    """Cohort LTV: one customer-grain shuffle for the cohort tag, one
    (cohort, age) aggregation, one cumulative window over ages (the
    per-cohort frame is months — tiny); revenue sums are DECIMAL-exact
    and cast to double once at the boundary."""
    o = orders.filter(F.col("o_orderdate").isNotNull())
    first = (o.groupBy("o_custkey")
             .agg(F.min(F.trunc(F.col("o_orderdate").cast("timestamp")
                                 .cast("date"), "month"))
                  .alias("cohort_month")))
    j = o.join(first, "o_custkey")
    age = (F.months_between(
        F.trunc(F.col("o_orderdate").cast("timestamp").cast("date"),
                "month"),
        F.col("cohort_month"))).cast("bigint")
    per = (j.withColumn("age_months", age)
            .groupBy("cohort_month", "age_months")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
                  .alias("__rev"),
                 F.count(F.lit(1)).alias("n_orders")))
    w = (Window.partitionBy("cohort_month").orderBy("age_months")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return per.select(
        F.col("cohort_month").cast("string").alias("cohort_month"),
        "age_months", "n_orders",
        F.sum("__rev").over(w).cast("double").alias("cum_revenue"))


_ORACLE = """
WITH o AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         o_totalprice
  FROM orders WHERE o_orderdate IS NOT NULL),
first AS (SELECT o_custkey, min(m) AS cohort_month FROM o GROUP BY 1),
j AS (
  SELECT f.cohort_month,
         CAST(datediff('month', f.cohort_month, o.m) AS BIGINT)
           AS age_months,
         o.o_totalprice
  FROM o JOIN first f USING (o_custkey)),
per AS (
  SELECT cohort_month, age_months,
         SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS rev,
         count(*) AS n_orders
  FROM j GROUP BY 1, 2)
SELECT CAST(cohort_month AS VARCHAR) AS cohort_month, age_months,
       n_orders,
       CAST(SUM(rev) OVER (PARTITION BY cohort_month ORDER BY age_months
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS cum_revenue
FROM per
"""


def test_cohort_ltv_duckdb_parity(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    got = cohort_ltv(orders)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    assert got.count() > 0


def test_cumulative_is_monotone_per_cohort(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    rows = cohort_ltv(orders).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_month"], []).append(
            (r["age_months"], r["cum_revenue"]))
    for seq in by_cohort.values():
        seq.sort()
        vals = [v for _, v in seq]
        assert vals == sorted(vals)


def test_age_zero_exists_for_every_cohort(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    got = cohort_ltv(orders)
    cohorts = got.select("cohort_month").distinct().count()
    zero = got.filter("age_months = 0").count()
    assert cohorts == zero  # the first month always has the cohort's orders
