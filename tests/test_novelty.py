"""N-gram novelty — staged round-6 `text_ngram_novelty`: per document,
the share of its distinct trigram shingles appearing for the FIRST
time in corpus order (doc_id). The curation-side diversity signal:
crawl batches full of near-boilerplate score near 0, genuinely new
material near 1 — and unlike pairwise dedup it is linear, one
min-aggregation over the shingle stream.

Shape: explode distinct shingles (the dedup family's stream), one
groupBy(shingle) min(doc_id) = the shingle's debut, join back, one
groupBy(doc) counting debuts — all exact integers, one division.
Docs with zero shingles (< n tokens) are excluded (novelty of an
empty set is undefined), matching the containment family's rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.text import shingles
from yougile_etl_pipeline_spark.registry_ext import _shingles_sql
from yougile_etl_pipeline_spark.sources.tables import load_table


def staged_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(F.col("doc_id"),
                     F.explode(shingles("text", 3)).alias("sh"))
    debut = ex.groupBy("sh").agg(F.min("doc_id").alias("debut_doc"))
    per_doc = (ex.join(debut, "sh")
                 .groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_shingles"),
                      F.count_if(F.col("debut_doc") == F.col("doc_id"))
                       .alias("n_novel")))
    return per_doc.withColumn(
        "novelty",
        F.col("n_novel").cast("double") / F.col("n_shingles"))


_ORACLE = f"""
WITH ex AS (
  SELECT doc_id, unnest({_shingles_sql('text', 3)}) AS sh
  FROM documents),
debut AS (SELECT sh, min(doc_id) AS debut_doc FROM ex GROUP BY 1),
per_doc AS (
  SELECT e.doc_id,
         count(*) AS n_shingles,
         CAST(count_if(d.debut_doc = e.doc_id) AS BIGINT) AS n_novel
  FROM ex e JOIN debut d USING (sh)
  GROUP BY 1)
SELECT doc_id, n_shingles, n_novel,
       CAST(n_novel AS DOUBLE) / n_shingles AS novelty
FROM per_doc
"""


def test_novelty_duckdb_parity(spark):
    got = staged_query(spark, SF_SMOKE)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0


def test_first_doc_is_fully_novel_and_copy_is_not(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon"),      # exact copy
         (3, "totally different words entirely here")],
        "doc_id long, text string")
    from yougile_etl_pipeline_spark.operators.text import shingles as _s  # noqa: F401
    ex = docs.select("doc_id", F.explode(shingles("text", 3)).alias("sh"))
    debut = ex.groupBy("sh").agg(F.min("doc_id").alias("debut_doc"))
    got = {r["doc_id"]: r for r in
           (ex.join(debut, "sh").groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_shingles"),
                   F.count_if(F.col("debut_doc") == F.col("doc_id"))
                    .alias("n_novel"))
              .withColumn("novelty", F.col("n_novel").cast("double")
                          / F.col("n_shingles"))).collect()}
    assert got[1]["novelty"] == 1.0
    assert got[2]["novelty"] == 0.0
    assert got[3]["novelty"] == 1.0


def test_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "alpha beta gamma delta")],
        "doc_id long, text string")
    ex = docs.select("doc_id", F.explode(shingles("text", 3)).alias("sh"))
    ids = {r["doc_id"] for r in ex.select("doc_id").distinct().collect()}
    assert ids == {2}
