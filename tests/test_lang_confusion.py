"""Language-ID confusion matrix (staged round-6
`text_lang_confusion`): declared `lang` vs the certified lang-id
predictor's `lang_pred`, counted. Reuses text_lang_id's oracle
fragments (single source of truth — the two oracles cannot drift).
Oracle proven BEFORE registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators import text as TX
from yougile_etl_pipeline_spark.registry_ext import (
    _LANG_CASE,
    _marker_count_sql,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def lang_confusion(docs):
    """Counts per (declared, predicted) pair — the QA matrix that
    says whether the marker-based predictor agrees with upstream
    labels. Map-only scoring + one bounded (≤ |langs|²) partial-agg
    shuffle."""
    from pyspark.sql import functions as F

    return (TX.language_id(docs)
            .groupBy("lang", "lang_pred")
            .agg(F.count(F.lit(1)).alias("n")))


_ORACLE = f"""
WITH pred AS (
  SELECT lang, CASE {_LANG_CASE} ELSE 'und' END AS lang_pred
  FROM (
    SELECT lang,
      {", ".join(f"{_marker_count_sql(m)} AS score_{lang}"
                 for lang, m in TX.LANG_MARKERS.items())},
      greatest({", ".join(f"{_marker_count_sql(m)}"
                          for m in TX.LANG_MARKERS.values())}) AS best
    FROM documents
  ))
SELECT lang, lang_pred, count(*) AS n
FROM pred GROUP BY 1, 2
"""


def test_confusion_counts_hand_case(spark):
    rows = [(1, "the the the", "en"),   # en markers -> pred en
            (2, "der der der", "de"),   # de markers -> pred de
            (3, "zzz qqq", "fr")]       # no markers -> und
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {(r.lang, r.lang_pred): r.n
           for r in lang_confusion(d).collect()}
    assert got == {("en", "en"): 1, ("de", "de"): 1, ("fr", "und"): 1}


def test_matrix_total_equals_corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    from pyspark.sql import functions as F

    total = lang_confusion(docs).agg(F.sum("n")).collect()[0][0]
    assert total == docs.count()


def test_lang_confusion_duckdb_parity(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = lang_confusion(docs)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    assert got.count() > 0
