"""Gram matrix + power iteration (operators/linalg.py): exact-integer
accumulation proofs (partitioning invariance, known values) plus the
staged round-6 `emb_gram_matrix` DuckDB oracle, proven bit-identical
BEFORE registration; top_component property-tested against numpy's
eigensolve (driver-side float, alignment not bits)."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.linalg import (
    gram_matrix,
    top_component,
)

EMBED_DIM = 64


def test_gram_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "embedding array<double>")
    got = {(r["i"], r["j"]): r["g_units"]
           for r in gram_matrix(df, scale=10).collect()}
    # floor per row THEN sum: (1*1*10)+(3*3*10)=100; (1*2*10)+(3*4*10)=140;
    # (2*2*10)+(4*4*10)=200
    assert got == {(0, 0): 100, (0, 1): 140, (1, 1): 200}


def test_floor_is_per_row_not_on_the_sum(spark):
    # 0.25*0.25*10 = 0.625 -> floor 0 per row; two rows sum to 0,
    # NOT floor(1.25) = 1
    df = spark.createDataFrame(
        [([0.25],), ([0.25],)], "embedding array<double>")
    [r] = gram_matrix(df, scale=10).collect()
    assert r["g_units"] == 0


def test_gram_partitioning_invariance(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    a = sorted(map(tuple, gram_matrix(emb.repartition(1)).collect()))
    b = sorted(map(tuple, gram_matrix(emb.repartition(13)).collect()))
    assert a == b
    assert len(a) == EMBED_DIM * (EMBED_DIM + 1) // 2


def test_top_component_aligns_with_numpy_eigensolve(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    # the synthetic corpus is near-isotropic (small spectral gap), so
    # convergence needs a deep iteration count — cheap at d=64
    vec = top_component(gram_matrix(emb), EMBED_DIM, iters=2000)
    rows = np.stack([r["embedding"] for r in emb.collect()]).astype(float)
    g = rows.T @ rows
    w, v = np.linalg.eigh(g)
    lead = v[:, np.argmax(w)]
    assert abs(float(np.dot(vec, lead))) > 0.999


# Staged round-6 oracle: exact integer Gram units over embeddings.
_ORACLE = """
WITH src AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
el AS (
  SELECT vec_id, CAST(t.i - 1 AS INT) AS i, v[t.i] AS x
  FROM src, unnest(range(1, len(v) + 1)) AS t(i)),
pairs AS (
  SELECT a.i AS i, b.i AS j,
         CAST(floor(a.x * b.x * 1000000000) AS BIGINT) AS u
  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i)
SELECT i, j, CAST(SUM(u) AS BIGINT) AS g_units
FROM pairs GROUP BY 1, 2
"""


def test_gram_matrix_duckdb_parity(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = gram_matrix(emb)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
