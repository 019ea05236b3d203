"""Product-quantization behavioral tests (operators/pq.py): exactness
when the codebook can represent the corpus perfectly, monotone training
error, recall against brute-force on the real embeddings table,
determinism across partitionings, and ADC arithmetic on a hand-checked
example."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.pq import (
    l2sq,
    pq_adc_topk,
    pq_encode,
    pq_seed_codebooks,
    pq_train,
    pq_adc_topk as _adc,  # noqa: F401  (alias kept for grep parity)
    pq_split,
)


def _vecs(spark, rows, id_col="vec_id"):
    return spark.createDataFrame(
        rows, f"{id_col} long, embedding array<double>")


def test_split_is_positional_and_covers(spark):
    df = _vecs(spark, [(1, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0])])
    out = {r.sub_id: r.subvec
           for r in pq_split(df, 3).collect()}
    assert out == {0: [1.0, 2.0], 1: [3.0, 4.0], 2: [5.0, 6.0]}


def test_adc_exact_when_codebook_is_lossless(spark):
    # 4 corpus vectors, k=4 codes per subspace: after training the
    # codebook can hold every subvector exactly, so ADC distance ==
    # true squared-L2 and top-1 of each corpus vector queried against
    # the corpus is itself at distance 0.
    rows = [(i, [float(i), float(i * i), 10.0 - i, float(i % 2)])
            for i in range(4)]
    corpus = _vecs(spark, rows)
    books = pq_train(corpus, m=2, k=4, iters=3)
    codes = pq_encode(corpus, books, m=2)
    queries = _vecs(spark, rows, id_col="query_id")
    top1 = {r.query_id: r for r in
            pq_adc_topk(codes, queries, books, k=1).collect()}
    for i in range(4):
        assert top1[i].match_id == i
        assert abs(top1[i].adc_dist2) < 1e-12


def test_training_error_monotone(spark):
    emb = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    sub = pq_split(emb, 4)

    def err(books):
        from yougile_etl_pipeline_spark.operators.pq import _pq_assign
        return (_pq_assign(sub, books, "vec_id")
                .agg(F.sum("d2")).collect()[0][0])

    seed_err = err(pq_seed_codebooks(emb, m=4, k=16))
    e1 = err(pq_train(emb, m=4, k=16, iters=1))
    e2 = err(pq_train(emb, m=4, k=16, iters=2))
    assert e1 <= seed_err + 1e-9
    assert e2 <= e1 + 1e-9


def test_adc_shortlist_recall_against_bruteforce_l2(spark):
    # real embeddings: the ADC SHORTLIST (top-50 of 500 = the exact-
    # rerank candidate set, the production composition) must capture
    # most of the exact L2 top-5. The corpus is near-isotropic (the
    # hardest case — see SCALE.md's LSH sizing note), and m=8,k=16 is
    # an 8-byte code per 64-dim vector: measured shortlist recall@5 is
    # 0.70 here; 0.55 is the regression floor (training is fully
    # deterministic, so drift can only come from a testdata refresh).
    emb = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    queries = (emb.filter(F.col("vec_id") % 37 == 0).limit(8)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    books = pq_train(emb, m=8, k=16, iters=2)
    codes = pq_encode(emb, books, m=8)
    got = {}
    for r in pq_adc_topk(codes, queries, books, k=50).collect():
        got.setdefault(r.query_id, set()).add(r.match_id)
    # exact L2 top-5 via the same HOF distance
    q = queries.select(F.col("query_id"), F.col("embedding").alias("qv"))
    exact = (emb.crossJoin(q)
             .select("query_id", "vec_id",
                     l2sq("embedding", "qv").alias("d2")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    truth = {}
    for r in (exact.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= 5).collect()):
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(got[qid] & t) / len(t) for qid, t in truth.items()]
    assert sum(recalls) / len(recalls) >= 0.55


def test_encode_deterministic_across_partitionings(spark):
    emb = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    books = pq_train(emb, m=4, k=16, iters=1)
    a = {r.vec_id: r.codes
         for r in pq_encode(emb.coalesce(1), books, m=4).collect()}
    b = {r.vec_id: r.codes
         for r in pq_encode(emb.repartition(17), books, m=4).collect()}
    assert a == b and len(a) > 0


def test_adc_matches_hand_computation(spark):
    # one query, codebook fixed by hand: ADC distance must equal the
    # sum of the per-subspace distances from the query to the CODEBOOK
    # entries the corpus vector encodes to (not to the raw vector)
    books = spark.createDataFrame(
        [(0, 0, [0.0, 0.0]), (0, 1, [1.0, 1.0]),
         (1, 0, [0.0, 0.0]), (1, 1, [2.0, 2.0])],
        "sub_id int, code int, cvec array<double>")
    codes = spark.createDataFrame([(7, [1, 0])],
                                  "vec_id long, codes array<int>")
    queries = _vecs(spark, [(1, [1.0, 0.0, 1.0, 1.0])],
                    id_col="query_id")
    r = pq_adc_topk(codes, queries, books, k=1).collect()[0]
    # sub0: q=[1,0] vs cvec[code=1]=[1,1] -> 1.0
    # sub1: q=[1,1] vs cvec[code=0]=[0,0] -> 2.0
    assert r.match_id == 7 and math.isclose(r.adc_dist2, 3.0)


def test_split_rejects_nondivisible_dim(spark):
    df = _vecs(spark, [(1, [1.0, 2.0, 3.0])])
    out = pq_split(df, 2).collect()
    # slice arithmetic on a non-divisible dim produces short subvectors
    # rather than silently wrong ones — guard documented in pq_split
    widths = {len(r.subvec) for r in out}
    assert widths != {2} or pytest.fail("3-dim split into m=2 "
                                        "cannot yield equal halves")


def test_ivfpq_restricts_candidates_and_keeps_quality(spark):
    from yougile_etl_pipeline_spark.operators.pq import ivfpq_topk

    emb = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    queries = (emb.filter(F.col("vec_id") % 37 == 0).limit(8)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    centroids = emb.filter(F.col("vec_id") < 22)  # ~sqrt(500)
    books = pq_train(emb, m=8, k=16, iters=2)
    codes = pq_encode(emb, books, m=8)
    full = {}
    for r in pq_adc_topk(codes, queries, books, k=10).collect():
        full.setdefault(r.query_id, set()).add(r.match_id)
    probed = {}
    rows = ivfpq_topk(emb, queries, centroids, books,
                      k=10, nprobe=4).collect()
    for r in rows:
        probed.setdefault(r.query_id, set()).add(r.match_id)
    # each query got results (set of query ids matches), and the probed
    # top-10 beats RANDOM list probing decisively: on this isotropic
    # corpus (worst case for a coarse quantizer — see the LSH sizing
    # note) random nprobe=4-of-22 would capture ~4/22=0.18 of the full-
    # ADC top-10; measured overlap is ~0.35. Clustered real corpora
    # concentrate far harder; the invariant test below pins semantics.
    assert set(probed) == set(full)
    overlaps = [len(probed[q] & full[q]) / len(full[q]) for q in full]
    assert sum(overlaps) / len(overlaps) >= 1.5 * (4 / 22)


def test_ivfpq_single_probe_is_subset_of_corpus_list(spark):
    # with nprobe=1, every match of a query must share the query's
    # nearest centroid — the defining invariant of list restriction
    from yougile_etl_pipeline_spark.operators.pq import ivfpq_topk
    from yougile_etl_pipeline_spark.operators.similarity import ivf_assign

    emb = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    queries = (emb.filter(F.col("vec_id") % 97 == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    centroids = emb.filter(F.col("vec_id") < 22)
    books = pq_train(emb, m=4, k=16, iters=1)
    out = ivfpq_topk(emb, queries, centroids, books, k=5, nprobe=1)
    c_of = {r.vec_id: r.centroid_id for r in ivf_assign(
        emb, centroids, nprobe=1).select("vec_id", "centroid_id")
        .collect()}
    q_of = {r.query_id: r.centroid_id for r in ivf_assign(
        queries,
        centroids.select(F.col("vec_id").alias("query_id"), "embedding"),
        id_col="query_id", nprobe=1)
        .select("query_id", "centroid_id").collect()}
    for r in out.collect():
        assert c_of[r.match_id] == q_of[r.query_id]


def test_train_with_k_exceeding_corpus_shrinks_codebook(spark):
    # 3 vectors, k=16: seeds can only produce 3 codes per subspace and
    # empty codes must not appear after Lloyd rounds
    corpus = _vecs(spark, [(1, [1.0, 2.0]), (2, [3.0, 4.0]),
                           (3, [5.0, 6.0])])
    books = pq_train(corpus, m=2, k=16, iters=2)
    per_sub = {}
    for r in books.collect():
        per_sub.setdefault(r.sub_id, set()).add(r.code)
    assert set(per_sub) == {0, 1}
    assert all(len(codes) <= 3 for codes in per_sub.values())


def test_adc_k_larger_than_corpus_returns_all(spark):
    rows = [(i, [float(i), 0.0]) for i in range(3)]
    corpus = _vecs(spark, rows)
    books = pq_train(corpus, m=2, k=4, iters=1)
    codes = pq_encode(corpus, books, m=2)
    queries = _vecs(spark, [(9, [0.0, 0.0])], id_col="query_id")
    out = pq_adc_topk(codes, queries, books, k=100).collect()
    assert len(out) == 3
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
