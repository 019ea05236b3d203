"""k-core peeling (operators/graph.py::kcore_peel): peel semantics,
fixpoint detection, and the staged round-6 `graph_kcore` DuckDB
oracle (3 unrolled peel rounds over the modular adjacency), proven
BEFORE registration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.graph import kcore_peel
from yougile_etl_pipeline_spark.sources.tables import load_table


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_tail_is_peeled_triangle_survives(spark):
    # triangle 1-2-3 with a pendant chain 3-4-5
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    got = {r["node"]: r["degree"]
           for r in kcore_peel(e, k=2, rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_chain_peels_progressively(spark):
    # a path graph has NO 2-core: each round removes the endpoints
    e = _edges(spark, [(i, i + 1) for i in range(1, 8)])
    r1 = kcore_peel(e, k=2, rounds=1).count()
    r3 = kcore_peel(e, k=2, rounds=3).count()
    r4 = kcore_peel(e, k=2, rounds=4).count()
    assert r1 > r3 > r4 == 0 or (r1 > r3 and r4 == 0)


def test_fixpoint_detectable_by_extra_round(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    a = sorted(map(tuple, kcore_peel(e, k=2, rounds=3).collect()))
    b = sorted(map(tuple, kcore_peel(e, k=2, rounds=4).collect()))
    assert a == b  # converged: rounds and rounds+1 agree


def test_invalid_params_raise(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        kcore_peel(e, k=0)
    with pytest.raises(ValueError):
        kcore_peel(e, rounds=0)


def _round_sql(i: int, k: int) -> str:
    p = f"e{i - 1}"
    return f"""
d{i} AS (SELECT a, count(*) AS c FROM {p} GROUP BY 1),
k{i} AS (SELECT a FROM d{i} WHERE c >= {k}),
e{i} AS (
  SELECT e.a, e.b FROM {p} e
  JOIN k{i} x ON e.a = x.a
  JOIN k{i} y ON e.b = y.a)"""


_ORACLE = f"""
WITH d0 AS (
  SELECT DISTINCT doc_id % 40 AS x, (doc_id * 7 + 3) % 40 AS y
  FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 3) % 40),
e0 AS (SELECT x AS a, y AS b FROM d0 UNION SELECT y, x FROM d0),
{_round_sql(1, 2)},
{_round_sql(2, 2)},
{_round_sql(3, 2)}
SELECT a AS node, count(*) AS degree FROM e3 GROUP BY 1
"""


def test_kcore_duckdb_parity(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    edges = d.select((F.col("doc_id") % 40).alias("src"),
                     ((F.col("doc_id") * 7 + 3) % 40).alias("dst"))
    got = kcore_peel(edges, k=2, rounds=3)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0, "modular graph has no 2-core - weak fixture"
