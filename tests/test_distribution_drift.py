"""Snapshot distribution drift (operators/quality.py::
distribution_drift): null-safe category accounting plus the staged
round-6 `quality_distribution_drift` DuckDB oracle, proven
bit-identical BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import distribution_drift


def _snap(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_known_shares_and_delta(spark):
    a = _snap(spark, ["x", "x", "x", "y"])          # x: .75, y: .25
    b = _snap(spark, ["x", "y", "y", "y"])          # x: .25, y: .75
    got = {r["k"]: r for r in
           distribution_drift(a, b, "k").collect()}
    assert (got["x"]["c_a"], got["x"]["c_b"]) == (3, 1)
    assert got["x"]["share_a"] == 0.75 and got["x"]["share_b"] == 0.25
    assert got["x"]["share_delta"] == 0.5
    assert got["y"]["share_delta"] == 0.5


def test_category_missing_from_one_side_counts_zero(spark):
    a = _snap(spark, ["old", "old"])
    b = _snap(spark, ["new"])
    got = {r["k"]: r for r in
           distribution_drift(a, b, "k").collect()}
    assert (got["old"]["c_b"], got["old"]["share_b"]) == (0, 0.0)
    assert (got["new"]["c_a"], got["new"]["share_a"]) == (0, 0.0)
    assert got["old"]["share_delta"] == 1.0


def test_null_is_a_tracked_category(spark):
    a = _snap(spark, ["x", None, None, None])
    b = _snap(spark, ["x", None])
    got = {r["k"]: r for r in
           distribution_drift(a, b, "k").collect()}
    assert got[None]["c_a"] == 3 and got[None]["c_b"] == 1
    assert got[None]["share_a"] == 0.75 and got[None]["share_b"] == 0.5


# Staged round-6 oracle: event-type mix drift, first half of January
# vs the rest of the events table.
_CUT = "TIMESTAMP '2024-01-16 00:00:00'"
_ORACLE = f"""
WITH sa AS (SELECT event_type FROM events WHERE ts < {_CUT}),
sb AS (SELECT event_type FROM events WHERE ts >= {_CUT}),
ca AS (SELECT event_type AS va, count(*) AS c_a FROM sa GROUP BY 1),
cb AS (SELECT event_type AS vb, count(*) AS c_b FROM sb GROUP BY 1),
na AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a FROM ca),
nb AS (SELECT CAST(SUM(c_b) AS BIGINT) AS n_b FROM cb)
SELECT COALESCE(va, vb) AS event_type,
       COALESCE(c_a, 0) AS c_a,
       COALESCE(c_b, 0) AS c_b,
       CAST(COALESCE(c_a, 0) AS DOUBLE) / CAST(n_a AS DOUBLE) AS share_a,
       CAST(COALESCE(c_b, 0) AS DOUBLE) / CAST(n_b AS DOUBLE) AS share_b,
       abs(CAST(COALESCE(c_a, 0) AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(COALESCE(c_b, 0) AS DOUBLE) / CAST(n_b AS DOUBLE))
         AS share_delta
FROM ca FULL OUTER JOIN cb ON va IS NOT DISTINCT FROM vb, na, nb
"""


def test_distribution_drift_duckdb_parity(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    cut = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    got = distribution_drift(ev.filter(F.col("ts") < cut),
                             ev.filter(F.col("ts") >= cut),
                             "event_type")
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() >= 5
