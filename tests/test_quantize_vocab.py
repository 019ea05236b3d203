"""Behavioral tests for int8 embedding quantization and vocabulary
coverage, beyond the oracle hash checks: reconstruction error bounds,
HOF/numpy path equivalence, search recall on dequantized vectors, and
OOV-rate invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.quantize import (
    dequantize,
    quantize_int8,
    quantize_int8_np,
    quantize_summary,
)
from yougile_etl_pipeline_spark.operators.similarity import brute_force_topk
from yougile_etl_pipeline_spark.operators.text import build_vocab, oov_stats
from yougile_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_quantize_codes_in_range_and_err_bounded(emb):
    rows = quantize_summary(emb).collect()
    assert rows
    for r in rows:
        # half-up rounding bounds reconstruction error by scale/2
        # (tolerance for float rounding at the exact boundary)
        assert r.max_abs_err <= r.scale * 0.5 * (1 + 1e-9)
    codes = quantize_int8(emb).select(
        F.array_max("qvec").alias("hi"), F.array_min("qvec").alias("lo"))
    hi, lo = codes.agg(F.max("hi"), F.min("lo")).first()
    assert hi <= 127 and lo >= -127
    assert hi == 127 or lo == -127  # max component hits the grid edge


def test_numpy_path_matches_hof_path(emb):
    hof = quantize_int8(emb).select("vec_id", "scale", "qvec")
    npv = quantize_int8_np(emb).select("vec_id", "scale", "qvec")
    a = {r.vec_id: (r.scale, list(r.qvec)) for r in hof.collect()}
    b = {r.vec_id: (r.scale, list(r.qvec)) for r in npv.collect()}
    assert a == b  # bit-identical scales, identical codes


def test_zero_vector_quantizes_to_zero(spark):
    df = spark.createDataFrame([(1, [0.0] * 4), (2, [0.0, 2.0, -1.0, 0.5])],
                               "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert out[1].scale == 0.0 and list(out[1].qvec) == [0, 0, 0, 0]
    # half-up = floor(x+0.5) rounds -63.5 toward +inf -> -63; 31.75 -> 32
    assert list(out[2].qvec) == [0, 127, -63, 32]
    dq = df.select("vec_id").join(
        quantize_int8(df).select(
            "vec_id", dequantize("qvec", "scale").alias("rec")), "vec_id")
    rec = {r.vec_id: list(r.rec) for r in dq.collect()}
    assert rec[1] == [0.0, 0.0, 0.0, 0.0]
    assert rec[2][1] == 2.0  # max component reconstructs exactly


def test_dequantized_search_recall(emb):
    """int8 at 64 dims is near-lossless for cosine ranking: top-5 on
    dequantized vectors must keep most of the exact top-5."""
    queries = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=5)
    dq = quantize_int8(emb).select(
        "vec_id", dequantize("qvec", "scale").alias("embedding"))
    quant = brute_force_topk(dq, dq.filter(F.col("vec_id") < 8), k=5)
    e = {(r.query_id, r.match_id) for r in exact.collect()}
    q = {(r.query_id, r.match_id) for r in quant.collect()}
    assert len(e & q) / len(e) >= 0.8


def test_vocab_rank_deterministic_and_contiguous(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c"), (2, "a b d")], "doc_id long, text string")
    v = build_vocab(df, top_v=3).collect()
    assert [(r.token, r.freq, r.rank) for r in
            sorted(v, key=lambda r: r.rank)] == [
        ("a", 3, 1), ("b", 3, 2), ("c", 1, 3)]  # tie a/b -> lexicographic


def test_oov_rate_invariants(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b x y"), (3, "x y z q")],
        "doc_id long, text string")
    vocab = build_vocab(df, top_v=2)  # a, b
    out = {r.doc_id: r for r in oov_stats(df, vocab).collect()}
    assert out[1].n_oov == 0 and out[1].oov_rate == 0.0
    assert out[2].n_oov == 2 and out[2].oov_rate == 0.5
    assert out[3].n_oov == 4 and out[3].oov_rate == 1.0
    for r in out.values():
        assert 0.0 <= r.oov_rate <= 1.0 and r.n_oov <= r.n_tokens
