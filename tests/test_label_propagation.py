"""Deterministic synchronous label propagation
(operators/graph.py::label_propagation): community semantics, tie
rule, symmetrization, and the staged round-6 `graph_label_propagation`
DuckDB oracle (3 unrolled rounds over the deterministic modular
adjacency, the `graph_pagerank` pattern) proven BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.graph import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_barbell_splits_into_two_communities(spark):
    # two triangles bridged by one edge: LPA must NOT merge them
    e = _edges(spark, [(1, 2), (2, 3), (1, 3),
                       (4, 5), (5, 6), (4, 6), (3, 4)])
    got = {r["node"]: r["community"]
           for r in label_propagation(e, iterations=3).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]


def test_tie_breaks_to_smallest_label(spark):
    # node 3 sees labels {1, 2} once each in round 1 -> must pick 1
    e = _edges(spark, [(1, 3), (2, 3)])
    got = {r["node"]: r["community"]
           for r in label_propagation(e, iterations=1).collect()}
    assert got[3] == 1


def test_star_oscillates_as_documented(spark):
    # sync LPA on a star flips center<->leaves each round — the
    # documented caveat, pinned so a refactor can't silently change it
    e = _edges(spark, [(10, 1), (10, 2), (10, 3)])
    r1 = {r["node"]: r["community"]
          for r in label_propagation(e, iterations=1).collect()}
    r2 = {r["node"]: r["community"]
          for r in label_propagation(e, iterations=2).collect()}
    assert r1[10] == 1 and r1[1] == 10          # swapped
    assert r2[10] == 10 and r2[1] == 1          # swapped back


def test_self_loops_and_parallel_edges_ignored(spark):
    e = _edges(spark, [(1, 1), (1, 2), (1, 2), (2, 1)])
    got = {r["node"]: r["community"]
           for r in label_propagation(e, iterations=1).collect()}
    # neighbor votes once: 1 sees {2}, 2 sees {1}
    assert got == {1: 2, 2: 1}


def test_partitioning_invariance(spark):
    e = _edges(spark, [(i % 17, (i * 5 + 2) % 17) for i in range(60)])
    a = sorted(map(tuple,
                   label_propagation(e.repartition(1),
                                     iterations=3).collect()))
    b = sorted(map(tuple,
                   label_propagation(e.repartition(7, "dst"),
                                     iterations=3).collect()))
    assert a == b


def _round(i: int) -> str:
    p = f"l{i - 1}"
    return f"""
nbr{i} AS (SELECT e.a AS node, l.lbl FROM e JOIN {p} l ON e.b = l.node),
cnt{i} AS (SELECT node, lbl, count(*) AS c FROM nbr{i} GROUP BY 1, 2),
l{i} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
    FROM cnt{i}) WHERE rn = 1)"""


# Staged round-6 oracle: 3 unrolled LPA rounds over the deterministic
# modular adjacency (the graph_triangle_count certified graph).
_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT doc_id % 40 AS x, (doc_id * 7 + 3) % 40 AS y
  FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 3) % 40),
e AS (SELECT x AS a, y AS b FROM d UNION SELECT y, x FROM d),
l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
{_round(1)},
{_round(2)},
{_round(3)}
SELECT node, lbl AS community FROM l3
"""


def test_label_propagation_duckdb_parity(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    edges = d.select((F.col("doc_id") % 40).alias("src"),
                     ((F.col("doc_id") * 7 + 3) % 40).alias("dst"))
    got = label_propagation(edges, iterations=3)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    n_comm = got.select("community").distinct().count()
    assert 1 < n_comm < got.count(), "degenerate community structure"
