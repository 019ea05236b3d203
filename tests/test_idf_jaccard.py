"""idf_weighted_jaccard_pairs (operators/dedup.py): hand-computed
weights, the mandatory stop-shingle cap, and blocked-pair semantics."""

from __future__ import annotations

from yougile_etl_pipeline_spark.operators.dedup import (
    idf_weighted_jaccard_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string")


def test_weights_and_score_hand_computed(spark):
    # 4 docs. Shingles (n=2): doc0/doc1 share "a b" and "b c"
    # (df=2 each, w = max(1, 4 div 2) = 2); every doc has a unique
    # tail shingle (df=1, w=4).
    d = _docs(spark, [
        (0, "en", "a b c x0"),
        (1, "en", "a b c x1"),
        (2, "en", "p q r x2"),
        (3, "en", "p q r x3"),
    ])
    rows = {(r.doc_a, r.doc_b): r for r in
            idf_weighted_jaccard_pairs(
                d, "doc_id", "text", n=2, threshold_ppm=1,
                block_cols=["lang"], max_shingle_df=10).collect()}
    r01 = rows[(0, 1)]
    # doc0 shingles: "a b"(2), "b c"(2), "c x0"(4) -> tw=8; same doc1.
    # inter = 2+2 = 4; union = 8+8-4 = 12; jac = 333333 ppm.
    assert r01.inter_w == 4 and r01.union_w == 12
    assert r01.jaccard_w_ppm == 333333
    assert (0, 2) not in rows  # no shared shingles across the groups


def test_mandatory_cap_drops_hot_shingles(spark):
    # "z z" appears in all 4 docs; with cap=3 it is excluded from both
    # the intersection and the totals, so otherwise-disjoint docs
    # produce NO pair at all.
    d = _docs(spark, [
        (0, "en", "z z a0 b0"),
        (1, "en", "z z a1 b1"),
        (2, "en", "z z a2 b2"),
        (3, "en", "z z a3 b3"),
    ])
    out = idf_weighted_jaccard_pairs(
        d, "doc_id", "text", n=2, threshold_ppm=1,
        block_cols=["lang"], max_shingle_df=3).collect()
    assert out == []


def test_language_blocking_bounds_pairs(spark):
    # identical text in different langs never pairs
    d = _docs(spark, [
        (0, "en", "m n o p"),
        (1, "ru", "m n o p"),
        (2, "en", "m n o p"),
    ])
    rows = {(r.doc_a, r.doc_b) for r in
            idf_weighted_jaccard_pairs(
                d, "doc_id", "text", n=2, threshold_ppm=1,
                block_cols=["lang"], max_shingle_df=10).collect()}
    assert rows == {(0, 2)}


def test_threshold_filters(spark):
    d = _docs(spark, [
        (0, "en", "a b c x0"),
        (1, "en", "a b c x1"),
    ])
    out = idf_weighted_jaccard_pairs(
        d, "doc_id", "text", n=2, threshold_ppm=900000,
        block_cols=["lang"], max_shingle_df=10).collect()
    assert out == []  # 333333 ppm < 900000
