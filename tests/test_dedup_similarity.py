"""Behavioral tests for dedup + similarity beyond the oracle checks:
MinHash/SimHash actually *detect* near-duplicates, ANN recall is sane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash,
)
from yougile_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    rows = [
        (1, base, "en"),
        (2, base, "en"),                                   # exact dup
        (3, base.replace("green", "dark"), "en"),          # near dup
        (4, "completely different words about spark query engines and "
            "distributed shuffle partitioning strategies here", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_clusters(near_dup_docs):
    out = {r.canonical_id: r.dup_count
           for r in exact_dedup(near_dup_docs, "doc_id", "text").collect()}
    assert out[1] == 2          # docs 1+2 share a fingerprint
    assert out[3] == 1 and out[4] == 1


def test_jaccard_finds_near_dups(near_dup_docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in shingle_jaccard_pairs(
                 near_dup_docs, "doc_id", "text",
                 threshold=0.5, block_cols=["lang"]).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_minhash_lsh_candidates(near_dup_docs):
    pairs = {(r.doc_a, r.doc_b)
             for r in minhash_lsh_pairs(near_dup_docs, "doc_id", "text",
                                        n_hashes=8, bands=4).collect()}
    assert (1, 2) in pairs            # identical docs always collide
    assert (1, 4) not in pairs        # unrelated docs shouldn't


def test_simhash_hamming_property(near_dup_docs):
    sigs = {r.doc: r.simhash64
            for r in simhash(near_dup_docs, "doc_id", "text").collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert sigs[1] == sigs[2]                          # identical text
    assert ham(sigs[1], sigs[3]) < ham(sigs[1], sigs[4])  # near < far


def test_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {(r.query_id, r.match_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.match_id)
              for r in lsh_bucket_topk(emb, q, k=5).collect()}
    # every ANN hit must be a real neighbor-candidate (same-bucket subset
    # of the corpus); recall is lossy but must be nonzero and only return
    # pairs the exact ranking could justify
    assert approx, "LSH returned nothing — buckets degenerate"
    recall = len(exact & approx) / len(exact)
    assert recall > 0.2, f"suspiciously low recall {recall}"


def test_ivf_recall_and_bucket_locality(spark):
    from yougile_etl_pipeline_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    centroids = emb.filter(F.col("vec_id") < 256)
    exact = {(r.query_id, r.match_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    ivf = {(r.query_id, r.match_id)
           for r in ivf_topk(emb, q, centroids, k=5).collect()}
    assert ivf, "IVF returned nothing"
    # 1-probe IVF on unclustered vectors: recall is bounded but must be
    # meaningfully above random (5/499 ≈ 0.01)
    recall = len(exact & ivf) / len(exact)
    assert recall > 0.1, f"IVF recall degenerate: {recall}"
