"""Code-vs-prose profiling + tokenizer fertility by language
(operators/text.py) — ROUND-7 BANK: oracle-proven here, registration
waits for r07 slots. Hand cases pin the character-class counts and
the integer-division determinism choice; DuckDB parity proves both at
certification scales."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.text import (
    bpe_fertility_by_lang,
    code_prose_profile,
)
from yougile_etl_pipeline_spark.sources.tables import load_table

CODE_ORACLE = """
WITH counts AS (
  SELECT doc_id,
         CAST(length(text) AS INTEGER) AS n_chars,
         CAST(length(text) - length(regexp_replace(
              text, '[^A-Za-z0-9 ]', '', 'g')) AS INTEGER) AS n_symbols,
         CAST(length(text) - length(regexp_replace(
              text, '[{}();=<>\\[\\]]', '', 'g')) AS INTEGER)
           AS n_code_punct
  FROM documents)
SELECT doc_id, n_chars, n_symbols, n_code_punct,
       CASE WHEN n_chars > 0
            THEN CAST(n_symbols AS BIGINT) * 1000000 // n_chars
            ELSE 0 END AS symbol_ppm,
       CASE WHEN n_chars > 0
            THEN CAST(n_code_punct AS BIGINT) * 1000000 // n_chars
            ELSE 0 END AS code_punct_ppm,
       (CASE WHEN n_chars > 0
             THEN CAST(n_symbols AS BIGINT) * 1000000 // n_chars
             ELSE 0 END) >= 20000 AS is_code_like
FROM counts
"""

FERTILITY_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(len(regexp_extract_all(
              text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe
  FROM documents),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         SUM(n_tok) AS total_tokens, SUM(n_bpe) AS total_bpe_tokens
  FROM per_doc GROUP BY 1)
SELECT lang, n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       CAST(total_bpe_tokens AS BIGINT) AS total_bpe_tokens,
       CASE WHEN total_tokens > 0
            THEN CAST(total_bpe_tokens AS DOUBLE)
                 / CAST(total_tokens AS DOUBLE)
       END AS fertility
FROM agg
"""


def test_code_profile_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "for (i=0; i<n; i++) { x[i] = y; }"),
         (2, "plain english words only here"),
         (3, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           code_prose_profile(df).collect()}
    # doc 1: symbols = ( ) = ; < ; + + ( ) { [ ] = ; } -> count them:
    # "for (i=0; i<n; i++) { x[i] = y; }" non-alnum-nonspace chars:
    # ( = ; < ; + + ) { [ ] = ; } = 14
    assert got[1]["n_symbols"] == 14
    assert got[1]["is_code_like"]
    assert got[2]["n_symbols"] == 0 and not got[2]["is_code_like"]
    assert got[3]["n_chars"] == 0 and got[3]["symbol_ppm"] == 0


def test_fertility_hand_case(spark):
    # "ab cd" -> 2 words, 2 bpe runs; "a-b x" -> 2 words, 4 bpe runs
    df = spark.createDataFrame(
        [("en", "ab cd"), ("en", "a-b x"), ("xx", "")],
        "lang string, text string")
    got = {r["lang"]: r for r in
           bpe_fertility_by_lang(df).collect()}
    assert got["en"]["total_tokens"] == 4
    assert got["en"]["total_bpe_tokens"] == 6
    assert got["en"]["fertility"] == pytest.approx(1.5)
    # empty doc: split('') -> [''] = 1 token with 0 bpe runs
    assert got["xx"]["n_docs"] == 1


def test_code_profile_duckdb_parity(spark):
    got = code_prose_profile(load_table(spark, SF_SMOKE, "documents"))
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, CODE_ORACLE)
    assert not issues, issues


def test_fertility_duckdb_parity(spark):
    got = bpe_fertility_by_lang(load_table(spark, SF_SMOKE, "documents"))
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, FERTILITY_ORACLE)
    assert not issues, issues
