"""DSIR-flavored domain-affinity scoring (operators/text.py):
behavioral proofs (in-domain docs outrank out-of-domain; exact-int
masses) plus the staged round-6 `text_domain_affinity` DuckDB oracle,
proven bit-identical BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.text import domain_affinity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_in_domain_docs_score_higher(spark):
    corpus = _docs(spark, [
        (1, "python spark sql shuffle partition"),
        (2, "python spark sql broadcast join"),
        (3, "soccer goal referee penalty match"),
        (4, "soccer striker goal keeper match"),
    ])
    target = corpus.filter("doc_id <= 2")  # the 'engineering' domain
    got = {r["doc_id"]: r for r in
           domain_affinity(corpus, target).collect()}
    assert got[1]["affinity"] > got[3]["affinity"]
    assert got[2]["affinity"] > got[4]["affinity"]
    # doc 1: 5 distinct tokens; raw df: python 2, spark 2, sql 2,
    # shuffle 1, partition 1 -> raw_mass 8; all in target -> tgt 8
    assert (got[1]["n_feats"], got[1]["tgt_mass"], got[1]["raw_mass"]) \
        == (5, 8, 8)
    assert got[1]["affinity"] == 1.0
    # doc 3: no token in target -> tgt_mass 0
    assert got[3]["tgt_mass"] == 0 and got[3]["affinity"] == 0.0


def test_every_input_doc_scored_once(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    tgt = docs.filter("lang = 'en'")
    out = domain_affinity(docs, tgt)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_duplicate_tokens_counted_once_per_doc(spark):
    corpus = _docs(spark, [(1, "x x x x y"), (2, "x y")])
    target = corpus.filter("doc_id = 2")
    got = {r["doc_id"]: r for r in
           domain_affinity(corpus, target).collect()}
    # features are DISTINCT tokens: doc 1 has feats {x, y} like doc 2
    assert got[1]["n_feats"] == got[2]["n_feats"] == 2
    assert got[1]["tgt_mass"] == got[2]["tgt_mass"]
    assert got[1]["raw_mass"] == got[2]["raw_mass"]


# Staged round-6 oracle: affinity of every document to the lang='en'
# slice (the in-domain sample), distinct-token features.
_ORACLE = """
WITH feats AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents),
tfeats AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents WHERE lang = 'en'),
rawdf AS (SELECT tok, count(*) AS rdf FROM feats GROUP BY 1),
tgtdf AS (SELECT tok, count(*) AS tdf FROM tfeats GROUP BY 1)
SELECT f.doc_id,
       count(*) AS n_feats,
       CAST(SUM(COALESCE(t.tdf, 0)) AS BIGINT) AS tgt_mass,
       CAST(SUM(r.rdf) AS BIGINT) AS raw_mass,
       CAST(SUM(COALESCE(t.tdf, 0)) AS DOUBLE) / SUM(r.rdf) AS affinity
FROM feats f
JOIN rawdf r USING (tok)
LEFT JOIN tgtdf t USING (tok)
GROUP BY 1
"""


def test_domain_affinity_duckdb_parity(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    tgt = docs.filter(F.col("lang") == "en")
    assert tgt.count() > 0, "fixture has no lang='en' docs - pick another"
    got = domain_affinity(docs, tgt)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
