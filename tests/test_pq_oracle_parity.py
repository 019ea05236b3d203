"""DuckDB differential for the PQ pipeline (operators/pq.py) — the
round-6 oracle, proven BEFORE registration: seeds → one Lloyd round →
encode must produce bit-identical codes on both engines, and ADC top-k
must produce identical rankings.

Portability notes this test pins down (the knowledge the r06 oracle
needs): squared-L2 is an elementwise transform + list_sum left-fold —
the same IEEE order as the engine's zip_with/aggregate expression;
argmin ties break on the smaller code (struct-min ↔ ORDER BY d2, code);
codebook means go through DECIMAL(20,9); ADC sums accumulate in
DECIMAL(27,12). Codes/arrays are stringified at the compare boundary
(the canonicalizer rejects raw arrays by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)

M, K, W = 4, 8, 16  # m subspaces, k codes, dim/m width (64-dim corpus)

_L2SQ = ("list_sum(list_transform(range(1, len({a}) + 1), "
         "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")

_PQ_BOOKS_SQL = f"""
src AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
sub AS (
  SELECT vec_id, s.sub_id,
         vec[s.sub_id * {W} + 1 : s.sub_id * {W} + {W}] AS subvec
  FROM src, (SELECT CAST(unnest(range(0, {M})) AS INT) AS sub_id) s),
seeds AS (
  SELECT sub_id,
         CAST(row_number() OVER (PARTITION BY sub_id ORDER BY vec_id) - 1
              AS INT) AS code,
         subvec AS cvec
  FROM sub
  QUALIFY row_number() OVER (PARTITION BY sub_id ORDER BY vec_id) <= {K}),
assign0 AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT b.vec_id, b.sub_id, s.code,
           row_number() OVER (
             PARTITION BY b.vec_id, b.sub_id
             ORDER BY {_L2SQ.format(a="b.subvec", b="s.cvec")}, s.code)
             AS rn
    FROM sub b JOIN seeds s USING (sub_id)) WHERE rn = 1),
means AS (
  SELECT sub.sub_id, code, CAST(t.i - 1 AS INT) AS pos,
         CAST(SUM(CAST(subvec[t.i] AS DECIMAL(20,9))) AS DOUBLE)
           / count(*) AS mean_val
  FROM assign0 JOIN sub USING (vec_id, sub_id),
       unnest(range(1, len(subvec) + 1)) AS t(i)
  GROUP BY 1, 2, 3),
books AS (
  SELECT sub_id, code, list(mean_val ORDER BY pos) AS cvec
  FROM means GROUP BY 1, 2),
assign1 AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT b.vec_id, b.sub_id, s.code,
           row_number() OVER (
             PARTITION BY b.vec_id, b.sub_id
             ORDER BY {_L2SQ.format(a="b.subvec", b="s.cvec")}, s.code)
             AS rn
    FROM sub b JOIN books s USING (sub_id)) WHERE rn = 1)
"""


def _emb(spark):
    return (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("embedding")))


def test_pq_encode_matches_duckdb(spark):
    emb = _emb(spark)
    books = pq_train(emb, m=M, k=K, iters=1)
    codes = pq_encode(emb, books, m=M)
    df = codes.select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), ",")
         .alias("codes"))
    sql = f"""
WITH {_PQ_BOOKS_SQL}
SELECT vec_id,
       array_to_string(list(code ORDER BY sub_id), ',') AS codes
FROM assign1 GROUP BY vec_id
"""
    con = duck_connect(SF_SMOKE)
    issues = compare(df, con, sql)
    assert not issues, issues


def test_pq_adc_topk_matches_duckdb(spark):
    emb = _emb(spark)
    books = pq_train(emb, m=M, k=K, iters=1)
    codes = pq_encode(emb, books, m=M)
    queries = (emb.filter(F.col("vec_id") % 97 == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = pq_adc_topk(codes, queries, books, k=5)
    sql = f"""
WITH {_PQ_BOOKS_SQL},
qsrc AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS vec
         FROM embeddings WHERE vec_id % 97 = 0),
qsub AS (
  SELECT query_id, s.sub_id,
         vec[s.sub_id * {W} + 1 : s.sub_id * {W} + {W}] AS subvec
  FROM qsrc, (SELECT CAST(unnest(range(0, {M})) AS INT) AS sub_id) s),
qtab AS (
  SELECT query_id, sub_id, code,
         CAST({_L2SQ.format(a="subvec", b="cvec")} AS DECIMAL(27,12))
           AS qd2
  FROM qsub JOIN books USING (sub_id)),
scored AS (
  SELECT q.query_id, a.vec_id, SUM(q.qd2) AS d
  FROM assign1 a JOIN qtab q
    ON a.sub_id = q.sub_id AND a.code = q.code
  GROUP BY 1, 2)
SELECT query_id, vec_id AS match_id,
       CAST(d AS DOUBLE) AS adc_dist2,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY d, vec_id) AS rank
      FROM scored)
WHERE rank <= 5
"""
    con = duck_connect(SF_SMOKE)
    issues = compare(out.withColumn("rank", F.col("rank").cast("long")),
                     con, sql)
    assert not issues, issues


_CSIM = ("list_dot_product({a}, {b}) / "
         "(sqrt(list_dot_product({a}, {a})) * "
         "sqrt(list_dot_product({b}, {b})))")

_NPROBE = 3


def test_ivfpq_topk_matches_duckdb(spark):
    # full IVF-PQ differential: cosine coarse assignment (corpus
    # nprobe=1, queries nprobe=3, centroid-id tie-breaks — the
    # similarity.ivf_assign contract) + PQ ADC restricted to probed
    # lists must rank identically on both engines.
    from yougile_etl_pipeline_spark.operators.pq import ivfpq_topk

    emb = _emb(spark)
    queries = (emb.filter(F.col("vec_id") % 97 == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    centroids = emb.filter(F.col("vec_id") < 22)
    books = pq_train(emb, m=M, k=K, iters=1)
    out = ivfpq_topk(emb, queries, centroids, books,
                     k=5, nprobe=_NPROBE) \
        .withColumn("rank", F.col("rank").cast("long"))
    csim = _CSIM.format(a="vec", b="cent_vec")
    sql = f"""
WITH {_PQ_BOOKS_SQL},
cent AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
         FROM embeddings WHERE vec_id < 22),
c_assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT s.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY {csim} DESC, c.centroid_id) AS rn
    FROM src s CROSS JOIN cent c) WHERE rn <= 1),
qsrc AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS vec
         FROM embeddings WHERE vec_id % 97 = 0),
q_probe AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {csim} DESC, c.centroid_id) AS rn
    FROM qsrc q CROSS JOIN cent c) WHERE rn <= {_NPROBE}),
cand AS (
  SELECT q.query_id, a.vec_id
  FROM c_assign a JOIN q_probe q USING (centroid_id)),
qsub AS (
  SELECT query_id, s.sub_id,
         vec[s.sub_id * {W} + 1 : s.sub_id * {W} + {W}] AS subvec
  FROM qsrc, (SELECT CAST(unnest(range(0, {M})) AS INT) AS sub_id) s),
qtab AS (
  SELECT query_id, sub_id, code,
         CAST({_L2SQ.format(a="subvec", b="cvec")} AS DECIMAL(27,12))
           AS qd2
  FROM qsub JOIN books USING (sub_id)),
scored AS (
  SELECT q.query_id, a.vec_id, SUM(q.qd2) AS d
  FROM assign1 a
  JOIN cand c ON a.vec_id = c.vec_id
  JOIN qtab q ON q.query_id = c.query_id
            AND a.sub_id = q.sub_id AND a.code = q.code
  GROUP BY 1, 2)
SELECT query_id, vec_id AS match_id,
       CAST(d AS DOUBLE) AS adc_dist2,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY d, vec_id) AS rank
      FROM scored)
WHERE rank <= 5
"""
    con = duck_connect(SF_SMOKE)
    issues = compare(out, con, sql)
    assert not issues, issues
