"""Fixed-round BFS layers (operators/graph.py::bfs_layers) — ROUND-7
BANK. Hand graph pins min-hop semantics (nearest seed wins, isolated
seeds stay layer 0, unreached nodes absent); DuckDB parity unrolls
the rounds as CTEs over the same modular graph the other iterative
graph entries use."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.graph import bfs_layers
from yougile_etl_pipeline_spark.sources.tables import load_table

# same modular adjacency as graph_kcore / graph_label_propagation;
# seeds = multiples of 10
_ORACLE = """
WITH d0 AS (
  SELECT DISTINCT doc_id % 40 AS x, (doc_id * 7 + 3) % 40 AS y
  FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 3) % 40),
e0 AS (SELECT x AS a, y AS b FROM d0 UNION SELECT y, x FROM d0),
l0 AS (SELECT DISTINCT doc_id % 40 AS node FROM documents
       WHERE (doc_id % 40) % 10 = 0),
l1 AS (
  SELECT DISTINCT e0.b AS node FROM e0 JOIN l0 ON e0.a = l0.node
  WHERE e0.b NOT IN (SELECT node FROM l0)),
l2 AS (
  SELECT DISTINCT e0.b AS node FROM e0 JOIN l1 ON e0.a = l1.node
  WHERE e0.b NOT IN (SELECT node FROM l0)
    AND e0.b NOT IN (SELECT node FROM l1)),
l3 AS (
  SELECT DISTINCT e0.b AS node FROM e0 JOIN l2 ON e0.a = l2.node
  WHERE e0.b NOT IN (SELECT node FROM l0)
    AND e0.b NOT IN (SELECT node FROM l1)
    AND e0.b NOT IN (SELECT node FROM l2))
SELECT node, 0 AS layer FROM l0
UNION ALL SELECT node, 1 FROM l1
UNION ALL SELECT node, 2 FROM l2
UNION ALL SELECT node, 3 FROM l3
"""


def _modular_graph(spark, sf):
    d = load_table(spark, sf, "documents")
    edges = d.select((F.col("doc_id") % 40).alias("src"),
                     ((F.col("doc_id") * 7 + 3) % 40).alias("dst"))
    seeds = d.select((F.col("doc_id") % 40).alias("node")) \
             .filter(F.col("node") % 10 == 0)
    return edges, seeds


def test_bfs_hand_case(spark):
    # path 0-1-2-3-4 plus isolated seed 9: layers 0,1,2,3 then cut off
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), (9,)], "node long")
    got = {r["node"]: r["layer"]
           for r in bfs_layers(edges, seeds, rounds=2).collect()}
    assert got == {0: 0, 9: 0, 1: 1, 2: 2}   # 3,4 beyond 2 rounds


def test_bfs_nearest_seed_wins(spark):
    # node 2 is 2 hops from seed 0 but 1 hop from seed 3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    got = {r["node"]: r["layer"]
           for r in bfs_layers(edges, seeds, rounds=3).collect()}
    assert got[2] == 1


def test_bfs_duckdb_parity(spark):
    edges, seeds = _modular_graph(spark, SF_SMOKE)
    got = bfs_layers(edges, seeds, rounds=3)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
