"""rake_keyphrases (operators/text.py): phrase segmentation, RAKE
deg/freq scoring, determinism, and the staged round-6
`text_rake_keyphrases` DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.text import (
    STOPWORDS,
    rake_keyphrases,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_stopwords_split_phrases(spark):
    # "fast key" and "slow lock" are separated by the stopword "the"
    d = _docs(spark, ["fast key the slow lock",
                      "fast key the slow lock"])
    rows = {r["phrase"]: r for r in rake_keyphrases(d).collect()}
    assert set(rows) == {"fast key", "slow lock"}
    assert all(r["n_words"] == 2 and r["n_occurrences"] == 2
               for r in rows.values())


def test_scores_hand_computed(spark):
    # one doc, phrases: "deep graph" ×2 (via two docs) — each word:
    # freq 2, deg 2+2=4 -> wppm 2_000_000; phrase = 4_000_000
    d = _docs(spark, ["deep graph", "deep graph"])
    r = rake_keyphrases(d).collect()[0]
    assert r["phrase"] == "deep graph"
    assert r["score_ppm"] == 4_000_000


def test_longer_phrases_outscore_in_degree(spark):
    # "alpha beta gamma" words get deg 3 each when the phrase is the
    # only context -> phrase score 3 * 3e6 = 9e6 > a lone word's 1e6
    d = _docs(spark, ["alpha beta gamma", "alpha beta gamma",
                      "solo the solo"])
    rows = {r["phrase"]: r["score_ppm"]
            for r in rake_keyphrases(d).collect()}
    assert rows["alpha beta gamma"] == 9_000_000
    assert rows["solo"] == 1_000_000


def test_min_count_filters_singletons(spark):
    d = _docs(spark, ["unique phrase here", "other words now"])
    assert rake_keyphrases(d, min_count=2).count() == 0


def test_deterministic_across_partitioning(spark):
    d = _docs(spark, [f"fast key w{i % 4} the slow lock"
                      for i in range(40)])
    run = lambda x: sorted(map(tuple, rake_keyphrases(  # noqa: E731
        x).collect()))
    assert run(d.coalesce(1)) == run(d.repartition(11))


_STOPLIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

_ORACLE = f"""
WITH toked AS (
  SELECT doc_id AS id, i AS pos, toks[i] AS tok,
         (list_contains({_STOPLIST}, toks[i]) OR toks[i] = '')
           AS is_stop
  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents) t,
       LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) l),
segged AS (
  SELECT id, pos, tok, is_stop,
         SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY id ORDER BY pos) AS seg
  FROM toked),
words AS (
  SELECT id, seg, pos, tok,
         count(*) OVER (PARTITION BY id, seg) AS plen
  FROM segged WHERE NOT is_stop),
wstats AS (
  SELECT tok, CAST(SUM(plen) * 1000000 // count(*) AS BIGINT) AS wppm
  FROM words GROUP BY tok),
phrases AS (
  SELECT id, seg,
         string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
         count(*) AS nw, CAST(SUM(ws.wppm) AS BIGINT) AS score
  FROM words w JOIN wstats ws USING (tok)
  GROUP BY 1, 2)
SELECT phrase, CAST(max(nw) AS BIGINT) AS n_words,
       count(*) AS n_occurrences, max(score) AS score_ppm
FROM phrases GROUP BY 1 HAVING count(*) >= 2
"""


def test_rake_duckdb_parity(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = rake_keyphrases(docs)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0
