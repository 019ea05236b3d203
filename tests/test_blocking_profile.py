"""Shingle blocking-cost profiler (operators/dedup.py::
shingle_blocking_profile): the estimator must be EXACT (proved against
the literal self-join row count) and the staged round-6
`dedup_blocking_profile` DuckDB oracle proven BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.dedup import (
    shingle_blocking_profile,
)
from yougile_etl_pipeline_spark.operators.text import shingles
from yougile_etl_pipeline_spark.registry_ext import _shingles_sql


def test_known_tiny_corpus(spark):
    # docs: "a b c" and "a b c d" share shingle "a b c"; second adds
    # "b c d" -> dfs: {"a b c": 2, "b c d": 1}
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d")], "doc_id long, text string")
    [r] = shingle_blocking_profile(df, "doc_id", "text").collect()
    assert r["n_docs"] == 2
    assert r["n_occurrences"] == 3
    assert r["n_distinct_shingles"] == 2
    assert r["max_df"] == 2
    assert r["candidate_pairs"] == 1      # 2*1/2 + 1*0/2


def test_estimate_equals_actual_join_volume(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    prof = shingle_blocking_profile(docs, "doc_id", "text",
                                    block_cols=["lang"])
    est = {r["lang"]: r["candidate_pairs"] for r in prof.collect()}
    ex = docs.select(F.col("doc_id").alias("doc"), "lang",
                     F.explode(shingles("text", 3)).alias("sh"))
    a = ex.select(F.col("doc").alias("da"), "lang", "sh")
    b = ex.select(F.col("doc").alias("db"),
                  F.col("lang").alias("l2"), "sh")
    actual = (a.join(b, (a.sh == b.sh) & (F.col("lang") == F.col("l2")))
               .filter(F.col("da") < F.col("db"))
               .groupBy("lang").agg(F.count(F.lit(1)).alias("n")))
    got = {r["lang"]: r["n"] for r in actual.collect()}
    assert est == got and est


_ORACLE = f"""
WITH ex AS (
  SELECT doc_id AS doc, lang, unnest({_shingles_sql()}) AS sh
  FROM documents
), per_sh AS (
  SELECT lang, sh, count(*) AS d FROM ex GROUP BY 1, 2
), d AS (
  SELECT lang, count(DISTINCT doc) AS n_docs,
         count(*) AS n_occurrences
  FROM ex GROUP BY 1
), agg AS (
  SELECT lang, count(*) AS n_distinct_shingles, max(d) AS max_df,
         CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS candidate_pairs
  FROM per_sh GROUP BY 1
)
SELECT lang, n_docs, n_occurrences, n_distinct_shingles, max_df,
       candidate_pairs
FROM d JOIN agg USING (lang)
"""


def test_blocking_profile_duckdb_parity(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = shingle_blocking_profile(docs, "doc_id", "text",
                                   block_cols=["lang"])
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []


# ---------------------------------------------------------------------------
# minhash_bucket_profile (round 11, r12 bank)
# ---------------------------------------------------------------------------

def test_minhash_bucket_profile_consistency(spark):
    """The bucket-size histogram must account for every (doc, band)
    assignment exactly: sum(bucket_size * n_buckets) == n_docs * bands,
    and the pair-volume column must equal the binomial per size."""
    from yougile_etl_pipeline_spark.operators.dedup import (
        minhash_bucket_profile,
    )
    from yougile_etl_pipeline_spark.sources.tables import load_table

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    rows = minhash_bucket_profile(docs, "doc_id", "text",
                                  n_hashes=8, bands=4, cap=64).collect()
    assert sum(r["bucket_size"] * r["n_buckets"] for r in rows) \
        == n_docs * 4
    for r in rows:
        assert r["pair_volume"] == (r["bucket_size"]
                                    * (r["bucket_size"] - 1) // 2
                                    * r["n_buckets"])
        assert r["over_cap"] == (r["bucket_size"] > 64)
    assert len(rows) > 0
