"""rfm_scores (operators/quality.py): quantile-band scoring semantics
and the staged round-6 `mart_rfm_scores` DuckDB oracle, proven BEFORE
registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import rfm_scores
from yougile_etl_pipeline_spark.sources.tables import load_table


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "cust long, d string, amt double").selectExpr(
        "cust", "cast(d as timestamp) AS ts", "amt")


def test_recent_frequent_big_scores_high(spark):
    rows = ([(1, f"2024-01-{d:02d}", 100.0) for d in range(1, 21)]
            + [(2, "2023-06-01", 1.0)])
    out = {r["cust"]: r for r in rfm_scores(
        _orders(spark, rows), "cust", "ts", "amt").collect()}
    # with n=2 entities the 20/40/60/80 cuts collapse to the two
    # values themselves — assert ORDER, not absolute band numbers
    assert out[1]["r_score"] == 5        # recent: below every cut
    assert out[2]["r_score"] < out[1]["r_score"]
    assert out[1]["f_score"] > out[2]["f_score"]
    assert out[1]["m_score"] > out[2]["m_score"]
    assert out[1]["rfm"] == (out[1]["r_score"] * 100
                             + out[1]["f_score"] * 10
                             + out[1]["m_score"])


def test_recency_zero_for_latest_customer(spark):
    rows = [(1, "2024-02-01", 5.0), (2, "2024-01-01", 5.0)]
    out = {r["cust"]: r["recency_days"] for r in rfm_scores(
        _orders(spark, rows), "cust", "ts", "amt").collect()}
    assert out[1] == 0 and out[2] == 31


def test_single_customer_all_mid_band(spark):
    rows = [(1, "2024-01-01", 10.0)]
    r = rfm_scores(_orders(spark, rows), "cust", "ts", "amt").collect()[0]
    # one entity: every cut equals its own value; strict < counts 0
    assert (r["r_score"], r["f_score"], r["m_score"]) == (5, 1, 1)


def _cut_sql(metric: str, ppm: int) -> str:
    # rank over NON-NULL metric rows only — exact_group_quantiles
    # excludes NULLs, and an all-NULL-amount entity must not shift
    # the cut ranks (DuckDB would otherwise rank it NULLS LAST and
    # count it in n)
    return (f"(SELECT v FROM (SELECT {metric} AS v, "
            f"row_number() OVER (ORDER BY {metric}) AS rn, "
            f"CAST(count(*) OVER () AS BIGINT) AS n FROM b2 "
            f"WHERE {metric} IS NOT NULL) "
            f"WHERE rn = (n * {ppm} + 999999) // 1000000)")


def _score_sql(metric: str, invert: bool) -> str:
    terms = " + ".join(
        f"(CASE WHEN {_cut_sql(metric, p)} < {metric} "
        f"THEN 1 ELSE 0 END)"
        for p in (200000, 400000, 600000, 800000))
    return f"5 - ({terms})" if invert else f"1 + ({terms})"


_ORACLE = f"""
WITH base AS (
  SELECT o_custkey,
         max(CAST(o_orderdate AS DATE)) AS last_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
           AS monetary
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1),
ref AS (SELECT max(last_d) AS ref_d FROM base),
b2 AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_d, ref_d) AS BIGINT)
           AS recency_days,
         frequency, monetary
  FROM base CROSS JOIN ref)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST({_score_sql('recency_days', True)} AS INT) AS r_score,
       CAST({_score_sql('frequency', False)} AS INT) AS f_score,
       CAST({_score_sql('monetary', False)} AS INT) AS m_score,
       CAST(({_score_sql('recency_days', True)}) * 100
            + ({_score_sql('frequency', False)}) * 10
            + ({_score_sql('monetary', False)}) AS INT) AS rfm
FROM b2
"""


def test_rfm_duckdb_parity(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    got = rfm_scores(orders, "o_custkey", "o_orderdate",
                     "o_totalprice")
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    # scores must span bands on real data
    assert got.select("r_score").distinct().count() >= 4


def test_all_null_amount_entity_scores_bottom_band(spark):
    # an entity whose every amount is NULL: monetary is NULL, its
    # m_score falls to band 1 (no cut is < NULL), and — the latent
    # oracle trap — it must NOT shift the other entities' cut ranks
    rows = [(1, "2024-01-10", None), (2, "2024-01-11", 50.0),
            (3, "2024-01-12", 70.0), (4, "2024-01-13", 90.0)]
    out = {r["cust"]: r for r in rfm_scores(
        _orders(spark, rows), "cust", "ts", "amt").collect()}
    assert out[1]["monetary"] is None and out[1]["m_score"] == 1
    # cuts over {50, 70, 90} only (n=3 → ranks 1,2,2,3 → cuts
    # [50,70,70,90]); 90 beats three cuts but TIES the p80 cut
    # (strict <, lower band), so band 4 — and crucially not shifted
    # by the NULL entity (including it would move the p80 rank)
    assert out[4]["m_score"] == 4
    assert out[2]["m_score"] == 1  # 50 ties the lowest cut
