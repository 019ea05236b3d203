"""Fixed-point EWMA (operators/timeseries.py): hand-checked recurrence,
partitioning invariance, and the DuckDB recursive-CTE differential —
the staged round-6 oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.timeseries import (
    ewma_fixed_point,
)


def test_ewma_hand_computed(spark):
    # alpha=1/4, S=10^6, cents scale: x = [100, 200, 100] (1.00, 2.00,
    # 1.00): s1=100e6; s2=(200e6+3*100e6)/4=125e6; s3=(100e6+3*125e6)
    # /4=118.75e6 -> ewma = 1.0, 1.25, 1.1875
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 1.0)],
        "user_id long, event_id long, value double")
    out = {r.event_id: r.ewma for r in ewma_fixed_point(
        df, "user_id", ["event_id"], "value").collect()}
    assert out == {1: 1.0, 2: 1.25, 3: 1.1875}


def test_ewma_partitioning_invariant(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet") \
        .select("user_id", "ts", "event_id", "value")
    base = lambda d: {(r.user_id, r.event_id): r.ewma  # noqa: E731
                      for r in ewma_fixed_point(
                          d, "user_id", ["ts", "event_id"],
                          "value").collect()}
    a = base(ev.coalesce(1))
    b = base(ev.repartition(19))
    assert a == b and len(a) > 0


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame([(1, 1, 1.0)],
                               "user_id long, event_id long, value double")
    with pytest.raises(ValueError):
        ewma_fixed_point(df, "user_id", ["event_id"], "value",
                         alpha_num=4, alpha_den=4)


def test_ewma_matches_duckdb_recursive_cte(spark):
    # the staged r06 oracle: same integer recurrence as a recursive
    # CTE walking rn -> rn+1 per user. Output keyed on (user_id,
    # event_id) with the one final IEEE division on both sides.
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet") \
        .select("user_id", "ts", "event_id", "value")
    out = (ewma_fixed_point(ev, "user_id", ["ts", "event_id"], "value")
           .select("user_id", "event_id", "ewma"))
    sql = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
ew AS (
  SELECT user_id, event_id, rn, v * 1000000 AS s
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_id, n.rn,
         (1 * n.v * 1000000 + 3 * ew.s) // 4
  FROM ew JOIN seq n ON n.user_id = ew.user_id AND n.rn = ew.rn + 1)
SELECT user_id, event_id,
       CAST(s AS DOUBLE) / 100000000.0 AS ewma
FROM ew
"""
    con = duck_connect(SF_SMOKE)
    issues = compare(out, con, sql)
    assert not issues, issues


def test_ewma_converges_toward_constant_input(spark):
    # constant series: ewma equals the constant at every step, exactly
    df = spark.createDataFrame(
        [(1, i, 7.25) for i in range(1, 30)],
        "user_id long, event_id long, value double")
    out = [r.ewma for r in ewma_fixed_point(
        df, "user_id", ["event_id"], "value").collect()]
    assert all(math.isclose(v, 7.25, abs_tol=1e-9) for v in out)


# ---------------------------------------------------------------------------
# holt_linear_fixed_point (round 11)
# ---------------------------------------------------------------------------

def _holt_ref(vals, p=1, q=4, r=1, s=5, scale=100, S=10**6):
    def tdiv(a, b):
        quo = abs(a) // abs(b)
        return quo if (a >= 0) == (b >= 0) else -quo

    ints = [int(round(v * scale)) for v in vals]
    l, b = ints[0] * S, 0
    out = [(l / (scale * S), 0.0)]
    for v in ints[1:]:
        ln = tdiv(p * v * S + (q - p) * (l + b), q)
        bn = tdiv(r * (ln - l) + (s - r) * b, s)
        l, b = ln, bn
        out.append((l / (scale * S), b / (scale * S)))
    return out


def test_holt_linear_matches_reference_incl_negative_trend(spark):
    from yougile_etl_pipeline_spark.operators.timeseries import (
        holt_linear_fixed_point,
    )
    vals = [10.0, 12.0, 8.5, 20.25, 3.0, 3.0, 1.25]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)],
        "k long, t long, value double")
    got = {r["t"]: (r["level"], r["trend"])
           for r in holt_linear_fixed_point(df, "k", ["t"], "value")
           .collect()}
    ref = _holt_ref(vals)
    assert len(got) == len(ref)
    for i, (lv, tr) in enumerate(ref):
        assert got[i] == (lv, tr), i
    # declining tail must produce a negative trend (the signed-state
    # truncation parity the oracle relies on)
    assert got[len(vals) - 1][1] < 0


def test_holt_linear_partitioning_invariant(spark):
    import random

    from yougile_etl_pipeline_spark.operators.timeseries import (
        holt_linear_fixed_point,
    )
    rng = random.Random(13)
    rows = [(k, t, round(rng.uniform(-50, 50), 2))
            for k in range(5) for t in range(40)]
    df1 = spark.createDataFrame(
        rows, "k long, t long, value double").coalesce(1)
    df8 = spark.createDataFrame(
        rows, "k long, t long, value double").repartition(8)
    r1 = {(r["k"], r["t"]): (r["level"], r["trend"])
          for r in holt_linear_fixed_point(df1, "k", ["t"], "value")
          .collect()}
    r8 = {(r["k"], r["t"]): (r["level"], r["trend"])
          for r in holt_linear_fixed_point(df8, "k", ["t"], "value")
          .collect()}
    assert r1 == r8


def test_holt_linear_rejects_bad_smoothing_params(spark):
    import pytest as _pt

    from yougile_etl_pipeline_spark.operators.timeseries import (
        holt_linear_fixed_point,
    )
    df = spark.createDataFrame([(1, 1, 1.0)], "k long, t long, value double")
    with _pt.raises(ValueError):
        holt_linear_fixed_point(df, "k", ["t"], "value",
                                alpha_num=4, alpha_den=4)
    with _pt.raises(ValueError):
        holt_linear_fixed_point(df, "k", ["t"], "value",
                                beta_num=0, beta_den=5)


# ---------------------------------------------------------------------------
# mann_kendall_trend (round 11)
# ---------------------------------------------------------------------------

def test_mann_kendall_hand_checked(spark):
    from yougile_etl_pipeline_spark.operators.timeseries import (
        mann_kendall_trend,
    )
    rows = []
    # key 'up': strictly increasing 10 points → S = 45, no ties
    rows += [("up", t, t * 2) for t in range(10)]
    # key 'flat': constant → S = 0 and the tie term zeroes var18
    rows += [("flat", t, 7) for t in range(10)]
    # key 'down': strictly decreasing → S = -45
    rows += [("down", t, 100 - 3 * t) for t in range(10)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = {r["k"]: r for r in
           mann_kendall_trend(df, "k", "t", "v").collect()}
    n = 10
    var18 = n * (n - 1) * (2 * n + 5)  # no ties
    assert out["up"]["s"] == 45 and out["down"]["s"] == -45
    assert out["up"]["var18_num"] == var18
    assert out["up"]["significant"] and out["down"]["significant"]
    assert out["up"]["z"] == 44 / (var18 / 18.0) ** 0.5
    assert out["down"]["z"] == -44 / (var18 / 18.0) ** 0.5
    # constant series: S = 0; tie correction removes the whole
    # variance (one group of 10 ties) → z = 0, not significant
    assert out["flat"]["s"] == 0
    assert out["flat"]["var18_num"] == var18 - 10 * 9 * 25
    assert out["flat"]["z"] == 0.0 or out["flat"]["var18_num"] > 0
    assert not out["flat"]["significant"]


def test_mann_kendall_single_observation_key_surfaces(spark):
    """A key with ONE observation has no pairwise rows; it must still
    appear in the output as n=1, s=0, var18_num=0, z=0, not
    significant (ADVICE r11 — the inner join used to drop it)."""
    from yougile_etl_pipeline_spark.operators.timeseries import (
        mann_kendall_trend,
    )
    rows = [("multi", t, t) for t in range(5)] + [("lone", 0, 42)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = {r["k"]: r for r in
           mann_kendall_trend(df, "k", "t", "v").collect()}
    assert "lone" in out
    lone = out["lone"]
    assert (lone["n"], lone["s"], lone["var18_num"]) == (1, 0, 0)
    assert lone["z"] == 0.0 and not lone["significant"]
    assert out["multi"]["s"] == 10  # the multi-point key is untouched
