"""Readability scoring (operators/text.py::readability_scores): known
-value checks and the staged round-6 `text_readability` DuckDB oracle,
proven BEFORE registration."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.text import readability_scores
from yougile_etl_pipeline_spark.sources.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_known_counts_and_score(spark):
    df = _docs(spark, [(1, "The cat sat. The dog ran!")])
    [r] = readability_scores(df).collect()
    assert r["n_words"] == 6
    assert r["n_sentences"] == 2
    # vowel runs: e, a, a, e, o, a -> 6
    assert r["n_syllable_groups"] == 6
    want = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert r["flesch"] == pytest.approx(want, abs=0)


def test_punctuation_free_text_floors_sentences(spark):
    df = _docs(spark, [(1, "word soup with no punctuation at all")])
    [r] = readability_scores(df).collect()
    assert r["n_sentences"] == 1
    assert r["flesch"] is not None


def test_simple_text_scores_higher_than_polysyllabic(spark):
    df = _docs(spark, [
        (1, "The cat sat on the mat. It was fun."),
        (2, "Institutional heterogeneity necessitates "
            "multidimensional organizational accountability."),
    ])
    got = {r["doc_id"]: r["flesch"]
           for r in readability_scores(df).collect()}
    assert got[1] > got[2]


_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
       len(regexp_extract_all(lower(text), '[aeiouy]+'))
         AS n_syllable_groups,
       206.835
         - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
                    / CAST(greatest(1, len(regexp_extract_all(text,
                        '[.!?]+'))) AS DOUBLE))
         - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE))
         AS flesch
FROM documents
"""


def test_readability_duckdb_parity(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = readability_scores(docs)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
