"""dup_span_removal (operators/text.py): debut-keeps semantics, span
deletion, text rebuild, and the staged round-6 `text_dup_span_removal`
DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.text import dup_span_removal
from yougile_etl_pipeline_spark.sources.tables import load_table


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_debut_doc_keeps_later_doc_loses(spark):
    d = _docs(spark, ["a b c d e", "x a b c y"])
    rows = {r["doc_id"]: r for r in
            dup_span_removal(d, n=3).collect()}
    assert rows[0]["clean_text"] == "a b c d e"
    assert rows[0]["n_removed"] == 0
    # doc 1 loses positions 2-4 ("a b c"), keeps "x" and "y"
    assert rows[1]["clean_text"] == "x y"
    assert rows[1]["n_removed"] == 3


def test_unique_docs_untouched(spark):
    d = _docs(spark, ["p q r s", "t u v w"])
    rows = dup_span_removal(d, n=3).collect()
    assert all(r["n_removed"] == 0 for r in rows)


def test_intra_doc_repetition_kept(spark):
    # a gram repeated only within ONE doc is not cross-doc duplicated
    d = _docs(spark, ["a b c z a b c", "m n o p q"])
    rows = {r["doc_id"]: r for r in
            dup_span_removal(d, n=3).collect()}
    assert rows[0]["n_removed"] == 0
    assert rows[0]["clean_text"] == "a b c z a b c"


def test_overlapping_spans_merge(spark):
    # doc 1 shares "a b c d" -> two overlapping trigrams, 4 positions
    d = _docs(spark, ["a b c d", "a b c d e"])
    rows = {r["doc_id"]: r for r in
            dup_span_removal(d, n=3).collect()}
    assert rows[1]["n_removed"] == 4
    assert rows[1]["clean_text"] == "e"


def test_chain_of_copies_all_point_to_first(spark):
    d = _docs(spark, ["k l m n", "k l m n", "k l m n"])
    rows = {r["doc_id"]: r["n_removed"]
            for r in dup_span_removal(d, n=3).collect()}
    assert rows[0] == 0 and rows[1] == 4 and rows[2] == 4


_N = 5

_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
ex AS (
  SELECT doc_id, s,
         md5(array_to_string(toks[s:s+{_N - 1}], ' ')) AS fp
  FROM t, LATERAL (SELECT unnest(range(1,
           greatest(len(toks) - {_N} + 1, 0) + 1)) AS s) ls),
debut AS (SELECT fp, min(doc_id) AS d0 FROM ex GROUP BY 1),
cov AS (
  SELECT doc_id, list_distinct(flatten(list(pr))) AS cov
  FROM (
    SELECT e.doc_id,
           list_transform(range(e.s, e.s + {_N}), x -> x) AS pr
    FROM ex e JOIN debut d USING (fp)
    WHERE d.d0 < e.doc_id)
  GROUP BY 1)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(cov.cov), 0) AS BIGINT) AS n_removed,
       COALESCE(array_to_string(
         list_filter(
           list_transform(range(1, len(t.toks) + 1),
                          i -> CASE WHEN cov.cov IS NULL
                                      OR NOT list_contains(cov.cov, i)
                                    THEN t.toks[i] END),
           x -> x IS NOT NULL), ' '), '') AS clean_text
FROM t LEFT JOIN cov USING (doc_id)
"""


def test_dup_removal_duckdb_parity(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = dup_span_removal(docs, n=_N)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    assert got.filter("n_removed > 0").count() > 0


# --- max_gram_df hot-gram cap (VERDICT r13 #2/#3: the actionable
# variant carries the same escape hatch as dup_span_coverage) ---


def test_capped_hot_gram_removes_nondebut_docs_whole(spark):
    # "a b c d e" spans 4 docs > cap 2 -> docs 1-3 removed WHOLE;
    # debut doc 0 always keeps its text.
    d = _docs(spark, ["a b c d e t0",
                      "a b c d e t1",
                      "a b c d e t2",
                      "a b c d e t3"])
    rows = {r["doc_id"]: r for r in
            dup_span_removal(d, n=5, max_gram_df=2).collect()}
    assert rows[0]["n_removed"] == 0
    assert rows[0]["clean_text"] == "a b c d e t0"
    for i in (1, 2, 3):
        assert rows[i]["n_removed"] == rows[i]["n_tokens"]
        assert rows[i]["clean_text"] == ""


def test_capped_honest_band_still_exact(spark):
    # "p q r s t" spans exactly 2 docs <= cap 2 -> exact span removal,
    # not whole-doc.
    d = _docs(spark, ["p q r s t u v",
                      "p q r s t x y"])
    rows = {r["doc_id"]: r for r in
            dup_span_removal(d, n=5, max_gram_df=2).collect()}
    assert rows[0]["n_removed"] == 0
    assert rows[1]["n_removed"] == 5
    assert rows[1]["clean_text"] == "x y"


def test_capped_large_cap_parity_with_exact(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {r["doc_id"]: (r["n_removed"], r["clean_text"])
             for r in dup_span_removal(docs, n=_N).collect()}
    capped = {r["doc_id"]: (r["n_removed"], r["clean_text"])
              for r in dup_span_removal(
                  docs, n=_N, max_gram_df=10**9).collect()}
    assert exact == capped
