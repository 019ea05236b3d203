"""bpe_encode (operators/bpe.py): the encode half of the tokenizer —
greedy left-to-right merge application must reproduce a reference
Python BPE encoder exactly, and a train→encode round trip must map
the training corpus to its trained symbol table."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    char_symbols,
)

_slow = settings(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _py_encode(word: str, merges: list[tuple]) -> list[str]:
    """Reference encoder: same greedy left-to-right single pass per
    merge as apply_merge's fold."""
    syms = list(word) + ["</w>"]
    for left, right, *_ in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def _words(spark, words):
    return spark.createDataFrame([(w,) for w in words], "word string")


def test_matches_reference_encoder_hand_case(spark):
    merges = [("a", "b"), ("ab", "c"), ("</w>", "</w>")]
    words = ["abc", "ab", "cab", "abab", ""]
    got = {r["word"]: r["tokens"] for r in bpe_encode(
        _words(spark, words), merges).collect()}
    for w in words:
        assert got[w] == _py_encode(w, merges), w


@given(words=st.lists(st.text(alphabet="abc", max_size=8),
                      min_size=1, max_size=10, unique=True),
       merges=st.lists(
           st.tuples(st.sampled_from(["a", "b", "c", "ab", "bc"]),
                     st.sampled_from(["a", "b", "c", "</w>"])),
           max_size=6))
@_slow
def test_matches_reference_encoder_property(spark, words, merges):
    got = {r["word"]: r["tokens"] for r in bpe_encode(
        _words(spark, words), merges).collect()}
    for w in words:
        assert got[w] == _py_encode(w, merges), (w, merges)


def test_train_encode_roundtrip(spark):
    # encoding the training words with the trained merge list must
    # reproduce the trainer's final symbol table exactly
    corpus = ["low", "lower", "lowest", "low", "low", "newer",
              "wider", "new"]
    df = (spark.createDataFrame([(w,) for w in corpus], "word string")
          .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
          .withColumn("syms", char_symbols("word")))
    trained, merges = bpe_train(df, n_merges=6, weight_col="cnt")
    assert merges, "training produced no merges — weak corpus"
    want = {r["word"]: r["syms"] for r in trained.collect()}
    got = {r["word"]: r["tokens"] for r in bpe_encode(
        df.select("word"), merges).collect()}
    assert got == want


def test_unseen_words_encode_with_trained_merges(spark):
    corpus = ["aaab", "aaab", "aaac"]
    df = (spark.createDataFrame([(w,) for w in corpus], "word string")
          .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
          .withColumn("syms", char_symbols("word")))
    _, merges = bpe_train(df, n_merges=3, weight_col="cnt")
    out = {r["word"]: r["tokens"] for r in bpe_encode(
        _words(spark, ["aaaa", "xyz"]), merges).collect()}
    for w in ("aaaa", "xyz"):
        assert out[w] == _py_encode(w, merges)


def test_n_tokens_column(spark):
    out = bpe_encode(_words(spark, ["ab"]), [("a", "b")]).collect()[0]
    assert out["n_tokens"] == len(out["tokens"]) == 2  # ['ab', '</w>']
