"""SimHash-banding recall/precision eval — the SimHash counterpart of
the certified `dedup_minhash_recall_eval` (same full-outer-join
scorecard, both sides exact ⇒ fully oracle-pairable). Staged round-6
`dedup_simhash_recall_eval`; oracle proven here BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.dedup import (
    shingle_jaccard_pairs,
    simhash_ham_pairs,
    simhash_portable,
)
from yougile_etl_pipeline_spark.registry_ext import (
    _SIMHASH_BITS,
    _SIMHASH_SIG,
    _shingles_sql,
)


def _eval_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # truth and candidates share the bigram shingle space the SimHash
    # signature is built from; truth is UNBLOCKED (simhash pairs carry
    # no lang blocking), stop-shingle cap 1000 as in production
    truth = shingle_jaccard_pairs(docs, "doc_id", "text", n=2,
                                  threshold=0.5, block_cols=None,
                                  max_shingle_df=1000) \
        .select("doc_a", "doc_b")
    cand = simhash_ham_pairs(
        simhash_portable(docs, "doc_id", "text")) \
        .select("doc_a", "doc_b")
    j = truth.withColumn("t", F.lit(1)).join(
        cand.withColumn("c", F.lit(1)),
        ["doc_a", "doc_b"], "full_outer")
    t_has = F.col("t").isNotNull()
    c_has = F.col("c").isNotNull()
    return j.agg(
        F.count_if(t_has).alias("n_true"),
        F.count_if(c_has).alias("n_candidates"),
        F.count_if(t_has & c_has).alias("n_hits"),
        F.count_if(t_has & ~c_has).alias("n_missed"),
        (F.count_if(t_has & c_has).cast("double")
         / F.count_if(t_has).cast("double")).alias("recall"),
        (F.count_if(t_has & c_has).cast("double")
         / F.count_if(c_has).cast("double")).alias("precision"))


_ORACLE = f"""
WITH ex0 AS (
  SELECT doc_id AS doc, unnest({_shingles_sql('text', 2)}) AS sh
  FROM documents
), dfc AS (
  SELECT sh, count(*) AS dfreq FROM ex0 GROUP BY 1
), exc AS (
  SELECT ex0.doc, ex0.sh FROM ex0 JOIN dfc USING (sh) WHERE dfreq <= 1000
), sizes AS (
  SELECT doc, count(*) AS sz FROM exc GROUP BY doc
), tp AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
  FROM exc a JOIN exc b ON a.sh = b.sh AND a.doc < b.doc
  GROUP BY 1, 2
), truth AS (
  SELECT doc_a, doc_b FROM tp
  JOIN sizes sa ON doc_a = sa.doc
  JOIN sizes sb ON doc_b = sb.doc
  WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5
), h AS (
  SELECT doc, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS hv FROM ex0
), agg AS (
  SELECT doc, count(*) AS n, {_SIMHASH_BITS} FROM h GROUP BY doc
), sig AS (
  SELECT doc, CAST({_SIMHASH_SIG} AS BIGINT) AS sig FROM agg
), bk AS (
  SELECT doc, sig, b.band, (sig >> (b.band * 15)) & 32767 AS bits
  FROM sig, unnest([0, 1, 2, 3]) AS b(band)
), cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.bits = b.bits
                     AND a.doc < b.doc
  WHERE bit_count(xor(a.sig, b.sig)) <= 3
), j AS (
  SELECT t.doc_a AS t_a, c.doc_a AS c_a
  FROM truth t FULL OUTER JOIN cand c
    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
)
SELECT
  CAST(count_if(t_a IS NOT NULL) AS BIGINT) AS n_true,
  CAST(count_if(c_a IS NOT NULL) AS BIGINT) AS n_candidates,
  CAST(count_if(t_a IS NOT NULL AND c_a IS NOT NULL) AS BIGINT) AS n_hits,
  CAST(count_if(t_a IS NOT NULL AND c_a IS NULL) AS BIGINT) AS n_missed,
  CAST(count_if(t_a IS NOT NULL AND c_a IS NOT NULL) AS DOUBLE)
    / CAST(count_if(t_a IS NOT NULL) AS DOUBLE) AS recall,
  CAST(count_if(t_a IS NOT NULL AND c_a IS NOT NULL) AS DOUBLE)
    / CAST(count_if(c_a IS NOT NULL) AS DOUBLE) AS precision
FROM j
"""


def test_simhash_eval_duckdb_parity(spark):
    got = _eval_df(spark, SF_SMOKE)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    [r] = got.collect()
    assert r["n_true"] > 0, "no true near-dup pairs - weak fixture"
    assert r["n_candidates"] > 0, "simhash produced no candidates"
