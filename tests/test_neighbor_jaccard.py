"""neighbor_jaccard (operators/graph.py): hand-checked scores, wedge
candidate generation, and the staged round-6 `graph_link_jaccard`
DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.graph import neighbor_jaccard
from yougile_etl_pipeline_spark.sources.tables import load_table


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_shared_neighbor_score(spark):
    # path 1-3, 2-3: N(1)={3}, N(2)={3} -> jaccard(1,2)=1/1=1.0
    e = _edges(spark, [(1, 3), (2, 3)])
    rows = {(r.node_a, r.node_b): r for r in
            neighbor_jaccard(e).collect()}
    assert rows[(1, 2)].jaccard == 1.0
    assert rows[(1, 2)].n_common == 1


def test_triangle_pairs(spark):
    # triangle 1-2-3: N(1)={2,3}, N(2)={1,3} -> common {3}... each
    # pair shares exactly the third node: jaccard = 1/3
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    rows = neighbor_jaccard(e).collect()
    assert len(rows) == 3
    assert all(r.n_common == 1 and r.jaccard == 1.0 / 3.0
               for r in rows)


def test_no_common_neighbors_no_pair(spark):
    # disjoint edges: no wedges, empty output
    e = _edges(spark, [(1, 2), (3, 4)])
    assert neighbor_jaccard(e).count() == 0


def test_min_common_filters(spark):
    # C4 cycle: (1,2) share {3,4} and (3,4) share {1,2} — both
    # survive min_common=2; nothing survives 3
    e = _edges(spark, [(1, 3), (2, 3), (1, 4), (2, 4)])
    kept = {(r.node_a, r.node_b)
            for r in neighbor_jaccard(e, min_common=2).collect()}
    assert kept == {(1, 2), (3, 4)}
    assert neighbor_jaccard(e, min_common=3).count() == 0


def test_orientation_and_duplicates_normalized(spark):
    # same graph given with duplicate and reversed edges
    a = neighbor_jaccard(_edges(spark, [(1, 3), (2, 3)]))
    b = neighbor_jaccard(_edges(spark, [(3, 1), (1, 3), (3, 2)]))
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))


_ORACLE = """
WITH d0 AS (
  SELECT DISTINCT doc_id % 40 AS x, (doc_id * 7 + 3) % 40 AS y
  FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 3) % 40),
und AS (SELECT x AS a, y AS b FROM d0 UNION SELECT y, x FROM d0),
deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1),
wedge AS (
  SELECT l.a AS node_a, r.b AS node_b
  FROM und l JOIN und r ON l.b = r.a
  WHERE l.a < r.b),
common AS (
  SELECT node_a, node_b, count(*) AS n_common
  FROM wedge GROUP BY 1, 2),
j AS (
  SELECT c.node_a, c.node_b, c.n_common,
         da.deg AS deg_a, db.deg AS deg_b
  FROM common c
  JOIN deg da ON da.a = c.node_a
  JOIN deg db ON db.a = c.node_b)
SELECT node_a, node_b, n_common, deg_a, deg_b,
       CAST(n_common AS DOUBLE)
         / CAST(deg_a + deg_b - n_common AS DOUBLE) AS jaccard
FROM j
"""


def test_neighbor_jaccard_duckdb_parity(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    edges = d.select((F.col("doc_id") % 40).alias("src"),
                     ((F.col("doc_id") * 7 + 3) % 40).alias("dst"))
    got = neighbor_jaccard(edges)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0
