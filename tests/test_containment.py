"""Shingle-containment near-dup pairs (operators/dedup.py): the
asymmetric sub-document lens. Behavioral proofs (containment finds what
Jaccard misses; cap parity with the Jaccard family) plus the staged
round-6 `dedup_shingle_containment` DuckDB oracle, proven bit-identical
BEFORE registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.dedup import (
    shingle_containment_pairs,
    shingle_jaccard_pairs,
)
from yougile_etl_pipeline_spark.registry_ext import _shingles_sql


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


QUOTE = "the quick brown fox jumps over the lazy dog"
PAGE = QUOTE + " " + " ".join(f"filler{i} words here" for i in range(30))


def test_containment_catches_subdocument_jaccard_misses(spark):
    df = _docs(spark, [(1, QUOTE), (2, PAGE)])
    cont = shingle_containment_pairs(df, "doc_id", "text",
                                     threshold=0.8).collect()
    assert len(cont) == 1
    [p] = cont
    assert (p["doc_a"], p["doc_b"]) == (1, 2)
    assert p["cont_a_in_b"] == 1.0          # every quote shingle in page
    assert p["cont_b_in_a"] < 0.2           # page mostly NOT in quote
    # the symmetric lens misses the same pair at the same bar
    jac = shingle_jaccard_pairs(df, "doc_id", "text",
                                threshold=0.8).collect()
    assert jac == []


def test_direction_is_reported_both_ways(spark):
    # identical docs: both directions 1.0
    df = _docs(spark, [(1, QUOTE), (2, QUOTE)])
    [p] = shingle_containment_pairs(df, "doc_id", "text",
                                    threshold=0.9).collect()
    assert p["cont_a_in_b"] == 1.0 and p["cont_b_in_a"] == 1.0
    assert p["common"] == p["sz_a"] == p["sz_b"]


def test_short_docs_yield_no_shingles_and_no_pairs(spark):
    df = _docs(spark, [(1, "too short"), (2, "too short")])
    assert shingle_containment_pairs(df, "doc_id", "text").collect() == []


def test_stop_shingle_cap_bounds_candidates(spark):
    # one hot shingle shared by all docs; cap 2 drops it, so no pairs
    hot = "alpha beta gamma"
    df = _docs(spark, [(i, hot + f" unique{i} tail{i}") for i in range(6)])
    capped = shingle_containment_pairs(df, "doc_id", "text",
                                       threshold=0.1, max_shingle_df=2)
    uncapped = shingle_containment_pairs(df, "doc_id", "text",
                                         threshold=0.1,
                                         max_shingle_df=None)
    assert capped.count() == 0
    assert uncapped.count() == 15  # all pairs share the hot shingle


# Staged round-6 oracle: containment pairs over documents, blocked by
# lang, cap 1000, either-direction threshold 0.4 (the fixture's docs
# are length-varied templated text — asymmetric overlaps exist there
# well below the 0.8 production default).
_ORACLE = f"""
WITH ex0 AS (
  SELECT doc_id AS doc, lang, unnest({_shingles_sql('text', 3)}) AS sh
  FROM documents
), dfc AS (
  SELECT lang, sh, count(*) AS dfreq FROM ex0 GROUP BY 1, 2
), ex AS (
  SELECT ex0.doc, ex0.lang, ex0.sh
  FROM ex0 JOIN dfc USING (lang, sh) WHERE dfreq <= 1000
), sizes AS (
  SELECT doc, count(*) AS sz FROM ex GROUP BY doc
), pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.lang = b.lang AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, common, sa.sz AS sz_a, sb.sz AS sz_b,
       CAST(common AS DOUBLE) / sa.sz AS cont_a_in_b,
       CAST(common AS DOUBLE) / sb.sz AS cont_b_in_a
FROM pairs
JOIN sizes sa ON doc_a = sa.doc
JOIN sizes sb ON doc_b = sb.doc
WHERE CAST(common AS DOUBLE) / sa.sz >= 0.4
   OR CAST(common AS DOUBLE) / sb.sz >= 0.4
"""


def test_containment_duckdb_parity(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = shingle_containment_pairs(docs, "doc_id", "text",
                                    threshold=0.4, block_cols=["lang"])
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0, "fixture produced no pairs - weak test"
