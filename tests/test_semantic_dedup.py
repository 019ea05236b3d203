"""SemDeDup-style semantic dedup (operators/similarity.py): cluster
restriction + within-cluster cosine ε-ball filter. Behavioral proofs
plus the staged round-6 `dedup_semantic` DuckDB oracle, proven
bit-identical BEFORE registration (the PQ/CMS staging pattern)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.similarity import semantic_dedup
from yougile_etl_pipeline_spark.registry_ext import (
    _CSIM,
    _ivf_assign_sql,
)


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_within_cluster_dups_marked_lowest_id_kept(spark):
    # two tight clusters on opposite axes; centroids = one seed per axis
    rows = [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.998, 0.02]),
            (10, [0.0, 1.0]), (11, [0.01, 0.999])]
    cents = _vec_df(spark, [(1, [1.0, 0.0]), (10, [0.0, 1.0])])
    out = {r["vec_id"]: r for r in
           semantic_dedup(_vec_df(spark, rows), cents,
                          threshold=0.99).collect()}
    assert out[1]["is_kept"] and out[1]["dup_of"] is None
    assert out[2]["dup_of"] == 1 and not out[2]["is_kept"]
    assert out[3]["dup_of"] == 1
    assert out[10]["is_kept"]
    assert out[11]["dup_of"] == 10


def test_cross_cluster_near_dups_not_compared(spark):
    # identical vectors forced into different clusters by assignment
    # (each IS a centroid) — the documented boundary-miss trade
    rows = [(1, [1.0, 0.001]), (2, [1.0, -0.001])]
    cents = _vec_df(spark, rows)
    out = semantic_dedup(_vec_df(spark, rows), cents,
                         threshold=0.5).collect()
    assert all(r["is_kept"] for r in out)


def test_one_row_per_input_vector(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n = emb.count()
    cents = emb.filter(F.col("vec_id") < int(round(math.sqrt(n))))
    out = semantic_dedup(emb, cents, threshold=0.25)
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n


# Staged round-6 oracle: √N-policy centroid sample (the IVF pattern),
# threshold 0.25 (the embedding-cosine dedup family's fixture-tuned bar).
_ORACLE = f"""
WITH src AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ca AS ({_ivf_assign_sql('src', 'vec_id', 'v')}),
dups AS (
  SELECT a.vec_id AS vec_id, MIN(b.vec_id) AS dup_of
  FROM ca a JOIN ca b
    ON a.centroid_id = b.centroid_id AND b.vec_id < a.vec_id
  WHERE {_CSIM.format(a='a.v', b='b.v')} >= 0.25
  GROUP BY 1)
SELECT c.vec_id, c.centroid_id, d.dup_of, d.dup_of IS NULL AS is_kept
FROM ca c LEFT JOIN dups d USING (vec_id)
"""


def test_semantic_dedup_duckdb_parity(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n = emb.count()
    cents = emb.filter(F.col("vec_id") < int(round(math.sqrt(n))))
    got = semantic_dedup(emb, cents, threshold=0.25)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    removed = got.filter("NOT is_kept").count()
    assert removed > 0, "fixture produced no semantic dups - weak test"
