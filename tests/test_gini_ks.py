"""Gini concentration + per-group KS drift (operators/quality.py) —
ROUND-7 BANK: oracle-proven here, registration waits for r07 slots.
Hand cases pin the formulas; DuckDB parity proves bit-exactness of
the single float op each metric allows itself."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import (
    gini_by_group,
    ks_by_group,
)
from yougile_etl_pipeline_spark.sources.tables import load_table

GINI_ORACLE = """
WITH vals AS (
  SELECT o_orderpriority AS grp,
         CAST(o_totalprice AS DECIMAL(24,6)) AS x
  FROM orders WHERE o_totalprice IS NOT NULL),
ranked AS (
  SELECT grp, x,
         CAST(row_number() OVER (PARTITION BY grp ORDER BY x)
              AS BIGINT) AS i
  FROM vals),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         SUM(x) AS s, SUM(i * x) AS s1
  FROM ranked GROUP BY 1)
SELECT grp AS o_orderpriority, n,
       CAST(CAST(s AS VARCHAR) AS DOUBLE) AS total,
       CASE WHEN n * s <> 0
            THEN CAST(CAST(2 * s1 - (n + 1) * s AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(n * s AS VARCHAR) AS DOUBLE)
       END AS gini
FROM agg
"""
# ^ the VARCHAR round-trips are load-bearing: DuckDB's DIRECT
# decimal->double cast double-rounds (int128 -> double, THEN /10^scale)
# and lands 1 ulp off the correctly-rounded value once the unscaled
# decimal exceeds 2^53 (Spark's BigDecimal.doubleValue is correctly
# rounded, as is both engines' string->double) — found at sf0.01 where
# n*s has 19 significant digits. New cross-engine gotcha recorded in
# SCALE.md; the engine side needs no change.

KS_ORACLE = """
WITH vals AS (
  SELECT event_type AS grp, value AS v
  FROM events WHERE value IS NOT NULL),
points AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt_all FROM vals GROUP BY 1),
gcnt AS (
  SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt_g
  FROM vals GROUP BY 1, 2),
groups AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_group FROM vals GROUP BY 1),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM vals),
grid AS (
  SELECT g.grp, g.n_group, t.n_total, p.v, p.cnt_all,
         COALESCE(c.cnt_g, 0) AS cg
  FROM groups g CROSS JOIN total t CROSS JOIN points p
  LEFT JOIN gcnt c ON c.grp = g.grp AND c.v = p.v),
cdf AS (
  SELECT grp, n_group, n_total,
         SUM(cg) OVER (PARTITION BY grp ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum_g,
         SUM(cnt_all) OVER (PARTITION BY grp ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum_all
  FROM grid)
SELECT grp AS event_type, n_group, n_total,
       MAX(ABS(CAST(cum_g AS DOUBLE) / n_group
               - CAST(cum_all AS DOUBLE) / n_total)) AS ks_d
FROM cdf GROUP BY 1, 2, 3
"""


def test_gini_hand_cases(spark):
    # perfect equality -> 0; total concentration (n=4) -> (n-1)/n·?
    # sample formula: values [0,0,0,12]: s=12, s1=4*12=48,
    # G = (96 - 5*12)/(4*12) = 36/48 = 0.75
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("a", 5.0),
         ("b", 0.0), ("b", 0.0), ("b", 0.0), ("b", 12.0)],
        "grp string, x double")
    got = {r["grp"]: r["gini"] for r in
           gini_by_group(df, "grp", "x").collect()}
    assert got["a"] == pytest.approx(0.0)
    assert got["b"] == pytest.approx(0.75)


def test_gini_all_zero_group_is_null(spark):
    df = spark.createDataFrame([("z", 0.0), ("z", 0.0)],
                               "grp string, x double")
    [r] = gini_by_group(df, "grp", "x").collect()
    assert r["gini"] is None and r["n"] == 2


def test_ks_hand_case(spark):
    # group a = {1, 2}, group b = {3, 4}; pooled = {1,2,3,4}
    # F_a jumps to 1 by x=2 while pooled F(2) = 0.5 -> D_a = 0.5
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)],
        "grp string, v double")
    got = {r["grp"]: r["ks_d"] for r in
           ks_by_group(df, "grp", "v").collect()}
    assert got["a"] == pytest.approx(0.5)
    assert got["b"] == pytest.approx(0.5)


def test_ks_identical_group_is_zero(spark):
    # a group that IS the pool (only group) has D = 0 exactly
    df = spark.createDataFrame(
        [("a", v) for v in (1.0, 2.0, 5.0, 9.0)], "grp string, v double")
    [r] = ks_by_group(df, "grp", "v").collect()
    assert r["ks_d"] == 0.0


def test_gini_duckdb_parity(spark):
    got = gini_by_group(load_table(spark, SF_SMOKE, "orders"),
                        "o_orderpriority", "o_totalprice")
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, GINI_ORACLE)
    assert not issues, issues


def test_ks_duckdb_parity(spark):
    got = ks_by_group(load_table(spark, SF_SMOKE, "events"),
                      "event_type", "value")
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, KS_ORACLE)
    assert not issues, issues


# ---------------------------------------------------------------------------
# lorenz_deciles (round 11): the decile drill-down of the gini number
# ---------------------------------------------------------------------------

def test_lorenz_deciles_hand_checked(spark):
    from yougile_etl_pipeline_spark.operators.quality import lorenz_deciles

    # 5 keys with values 1..5 (total 15), 10 bands: band of rank r is
    # (r-1)*10 div 5 → bands 0,2,4,6,8 each hold exactly one key.
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "k long, v long")
    out = {r["band"]: r for r in
           lorenz_deciles(df, "k", "v", n_bands=10).collect()}
    assert sorted(out) == [0, 2, 4, 6, 8]
    assert all(out[b]["n_keys"] == 1 for b in out)
    assert out[0]["band_total"] == 1 and out[8]["band_total"] == 5
    assert out[0]["share_ppm"] == 1 * 10**6 // 15
    assert out[8]["share_ppm"] == 5 * 10**6 // 15


def test_lorenz_deciles_shares_monotone_and_bounded(spark):
    import random

    from yougile_etl_pipeline_spark.operators.quality import lorenz_deciles

    rng = random.Random(5)
    df = spark.createDataFrame(
        [(k, rng.randrange(1, 10**6)) for k in range(237)],
        "k long, v long")
    rows = sorted(lorenz_deciles(df, "k", "v").collect(),
                  key=lambda r: r["band"])
    assert [r["band"] for r in rows] == list(range(10))
    # equal-population cut: sizes differ by at most one
    sizes = [r["n_keys"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # ascending-value ranking → band totals non-decreasing, shares sum
    # to at most 1e6 (truncation only loses)
    totals = [r["band_total"] for r in rows]
    assert totals == sorted(totals)
    assert sum(r["share_ppm"] for r in rows) <= 10**6
    assert sum(r["n_keys"] for r in rows) == 237
