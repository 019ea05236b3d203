"""Distributed BPE merge step (operators/bpe.py): greedy-overlap and
tie-break semantics, the training loop, and the staged round-6
`text_bpe_merge_step` DuckDB oracle — the engine's map-only HOF fold
proven equal to the SQL run-parity greedy formulation BEFORE
registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.bpe import (
    apply_merge,
    best_pair,
    bpe_train,
    char_symbols,
    pair_counts,
)


def _words(spark, rows):
    df = spark.createDataFrame(rows, "word string, cnt long")
    return df.withColumn("syms", char_symbols("word"))


def test_overlap_merges_greedy_left_to_right(spark):
    df = _words(spark, [("aaa", 1)])
    pc = {(r["left"], r["right"]): r["cnt"]
          for r in pair_counts(df, weight_col="cnt").collect()}
    assert pc[("a", "a")] == 2 and pc[("a", "</w>")] == 1
    win = best_pair(pair_counts(df, weight_col="cnt"))
    assert win == ("a", "a", 2)
    [r] = apply_merge(df, "a", "a").collect()
    assert r["syms"] == ["aa", "a", "</w>"]   # NOT ["aa", "aa", ...]


def test_four_in_a_row_merges_twice(spark):
    df = _words(spark, [("aaaa", 1)])
    [r] = apply_merge(df, "a", "a").collect()
    assert r["syms"] == ["aa", "aa", "</w>"]


def test_winner_tie_breaks_lexicographically(spark):
    df = _words(spark, [("bc", 1), ("ad", 1)])
    assert best_pair(pair_counts(df, weight_col="cnt")) == ("a", "d", 1)


def test_weights_multiply_pair_counts(spark):
    df = _words(spark, [("xy", 5), ("xz", 3)])
    pc = {(r["left"], r["right"]): r["cnt"]
          for r in pair_counts(df, weight_col="cnt").collect()}
    assert pc[("x", "y")] == 5 and pc[("x", "z")] == 3


def test_best_pair_none_when_fully_merged(spark):
    df = spark.createDataFrame([(["tok"],)], "syms array<string>")
    assert best_pair(pair_counts(df)) is None


def test_empty_word_yields_marker_only(spark):
    df = _words(spark, [("", 1)])
    [r] = df.collect()
    assert r["syms"] == ["</w>"]


def test_bpe_train_produces_ordered_merge_table(spark):
    df = _words(spark, [("low", 5), ("lower", 2), ("lowest", 3)])
    out, merges = bpe_train(df, 4, weight_col="cnt", checkpoint_every=2)
    assert len(merges) == 4
    # 'l o' appears in all 10 words — must be the first merge
    assert merges[0] == ("l", "o", 10)
    assert merges[1] == ("lo", "w", 10)
    # deterministic on re-run
    _, merges2 = bpe_train(df, 4, weight_col="cnt", checkpoint_every=2)
    assert merges == merges2
    # merges 3/4 extend 'low' ('low</w>' for the bare word, 'lowe' for
    # the suffixed ones) — every word's first symbol subsumes 'low'
    assert merges[2] == ("low", "</w>", 5)
    assert merges[3] == ("low", "e", 5)
    assert all(r["syms"][0].startswith("low") for r in out.collect())


# Staged round-6 oracle for `text_bpe_merge_step`: corpus word-frequency
# table from documents, one merge step, merged symbol string per word.
# Greedy selection in SQL = run-parity: among match positions, group
# maximal runs of consecutive i (grp = i - row_number), keep odd ranks.
_ORACLE = """
WITH words AS (
  SELECT tok AS word, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok != '' GROUP BY 1),
syms AS (
  SELECT word, cnt,
         list_append(list_transform(range(1, length(word) + 1),
                                    i -> word[i]), '</w>') AS s
  FROM words),
pos AS (
  SELECT word, cnt, CAST(t.i AS INT) AS i, s[t.i] AS l, s[t.i + 1] AS r
  FROM syms, unnest(range(1, len(s))) AS t(i)),
pc AS (SELECT l, r, SUM(cnt) AS c FROM pos GROUP BY 1, 2),
win AS (SELECT l, r FROM pc ORDER BY c DESC, l, r LIMIT 1),
match AS (
  SELECT p.word, p.i FROM pos p JOIN win w ON p.l = w.l AND p.r = w.r),
runs AS (
  SELECT word, i,
         i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
  FROM match),
sel AS (
  SELECT word, i FROM (
    SELECT word, i,
           row_number() OVER (PARTITION BY word, grp ORDER BY i) AS k
    FROM runs) WHERE k % 2 = 1),
expanded AS (
  SELECT s.word, s.cnt, CAST(t.i AS INT) AS i, s.s[t.i] AS sym
  FROM syms s, unnest(range(1, len(s.s) + 1)) AS t(i)),
rebuilt AS (
  SELECT e.word, e.cnt, e.i,
         CASE WHEN sm.i IS NOT NULL THEN w.l || w.r ELSE e.sym END AS tok
  FROM expanded e
  CROSS JOIN win w
  LEFT JOIN sel sm ON sm.word = e.word AND sm.i = e.i
  LEFT JOIN sel sp ON sp.word = e.word AND sp.i = e.i - 1
  WHERE sp.i IS NULL)
SELECT word, cnt, array_to_string(list(tok ORDER BY i), ' ') AS merged
FROM rebuilt GROUP BY 1, 2
"""


def test_bpe_merge_step_duckdb_parity(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    words = (docs.select(F.explode(F.split("text", " ")).alias("word"))
                 .filter(F.col("word") != "")
                 .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
                 .withColumn("syms", char_symbols("word")))
    win = best_pair(pair_counts(words, weight_col="cnt"))
    assert win is not None
    merged = (apply_merge(words, win[0], win[1])
              .select("word", "cnt",
                      F.array_join("syms", " ").alias("merged")))
    con = duck_connect(SF_SMOKE)
    assert compare(merged, con, _ORACLE) == []
    # the step must actually merge something in the fixture
    assert merged.filter(F.col("merged").contains(win[0] + win[1])).count() > 0
