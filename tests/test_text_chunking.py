"""repetition_stats + chunk_documents (operators/text.py) unit and
property tests. The oracle pair (text_repetition_stats / doc_chunks)
covers bit-parity; these cover the semantic contracts."""
from __future__ import annotations

from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.operators.text import (
    chunk_documents,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_flags_spam(spark):
    out = {r.doc_id: r for r in repetition_stats(_docs(spark, [
        (1, "buy now " * 30 + "limited offer"),        # one bigram dominates
        (2, "a quick brown fox jumps over lazy dogs while rain falls"),
    ])).collect()}
    assert not out[1].repetition_ok and out[1].top_bigram_frac > 0.4
    assert out[2].repetition_ok and out[2].dup_token_ratio == 0.0


def test_chunks_cover_exactly_with_no_overlap(spark):
    """stride == chunk_size ⇒ chunks partition the token stream: they
    reassemble to the original text and token counts sum to n."""
    text = " ".join(f"w{i}" for i in range(75))
    rows = (chunk_documents(_docs(spark, [(1, text)]),
                            chunk_size=32, stride=32)
            .orderBy("chunk_idx").collect())
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert " ".join(r.chunk_text for r in rows) == text
    assert sum(r.chunk_tokens for r in rows) == 75
    assert [r.chunk_tokens for r in rows] == [32, 32, 11]


def test_chunks_overlap_stride(spark):
    """stride < chunk_size ⇒ consecutive chunks share chunk−stride
    tokens; every token position is covered by the chunk starting at its
    stride window."""
    text = " ".join(f"w{i}" for i in range(50))
    rows = (chunk_documents(_docs(spark, [(1, text)]),
                            chunk_size=32, stride=24)
            .orderBy("chunk_idx").collect())
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    c0, c1 = rows[0].chunk_text.split(" "), rows[1].chunk_text.split(" ")
    assert c0[24:] == c1[:8]            # 8-token overlap
    assert rows[2].chunk_tokens == 2    # 50 - 48
    # short doc: single short chunk
    short = chunk_documents(_docs(spark, [(2, "one two")]),
                            chunk_size=32, stride=24).collect()
    assert len(short) == 1 and short[0].chunk_tokens == 2


def test_line_dedup_drops_shared_segments_keeps_order(spark):
    """A segment (aligned seg_tokens window) shared by >= min_df docs is
    dropped from EVERY document; unique segments survive in original
    order; a fully-boilerplate doc survives with empty text."""
    from yougile_etl_pipeline_spark.operators.text import line_dedup

    boiler = "terms of service apply"                  # one 4-token segment
    rows = [
        (1, boiler + " alpha beta gamma delta"),       # boiler + unique
        (2, boiler + " epsilon zeta eta theta"),       # boiler + unique
        (3, boiler),                                   # only boiler
        (4, "iota kappa lambda mu nu xi omicron pi"),  # two unique segs
    ]
    out = {r.doc_id: r for r in line_dedup(
        _docs(spark, rows), seg_tokens=4, min_df=2).collect()}
    assert out[1].clean_text == "alpha beta gamma delta"
    assert out[2].clean_text == "epsilon zeta eta theta"
    assert out[3].clean_text == "" and out[3].n_kept == 0
    assert out[3].n_dropped == 1
    assert out[4].clean_text == "iota kappa lambda mu nu xi omicron pi"
    assert out[4].n_dropped == 0
    assert all(r.n_kept + r.n_dropped >= 1 for r in out.values())


def test_line_dedup_alignment_blocks_cross_offset_matches(spark):
    """Segmentation is aligned: the same words at a different alignment
    are different segments (exact line dedup, not shingle dedup)."""
    from yougile_etl_pipeline_spark.operators.text import line_dedup

    rows = [
        (1, "a b c d e f g h"),      # segments: [a b c d], [e f g h]
        (2, "x a b c d e f g"),      # segments: [x a b c], [d e f g]
    ]
    out = {r.doc_id: r for r in line_dedup(
        _docs(spark, rows), seg_tokens=4, min_df=2).collect()}
    assert out[1].n_dropped == 0 and out[2].n_dropped == 0


def test_self_dedup_keeps_first_occurrence_in_order(spark):
    """Within a doc, later copies of a segment drop, first stays at its
    position; distinct docs don't affect each other (no cross-doc
    state)."""
    from yougile_etl_pipeline_spark.operators.text import self_dedup

    rows = [
        (1, "a b c d a b e f"),   # segs(2): [a b][c d][a b][e f]
        (2, "a b a b a b"),       # all same segment
        (3, "x y z w"),           # no repeats
    ]
    out = {r.doc_id: r for r in self_dedup(
        _docs(spark, rows), seg_tokens=2).collect()}
    assert out[1].clean_text == "a b c d e f"
    assert (out[1].n_kept, out[1].n_dropped) == (3, 1)
    assert out[2].clean_text == "a b"
    assert (out[2].n_kept, out[2].n_dropped) == (1, 2)
    assert out[3].clean_text == "x y z w" and out[3].n_dropped == 0


def test_topk_per_group_quota_and_tiebreak(spark):
    """Each group keeps exactly min(k, |group|) rows, ranked score DESC
    with ascending id tie-break — survivor set independent of input
    order/partitioning."""
    from yougile_etl_pipeline_spark.operators.quality import topk_per_group

    df = spark.createDataFrame(
        [(1, "a", 0.9), (2, "a", 0.9), (3, "a", 0.5), (4, "a", 0.1),
         (5, "b", 0.7), (6, "b", 0.2)],
        "doc_id long, source string, q double").repartition(5)
    out = topk_per_group(df, "source", "q", "doc_id", 2).collect()
    kept = {(r.source, r.doc_id, r.rank) for r in out}
    assert kept == {("a", 1, 1), ("a", 2, 2), ("b", 5, 1), ("b", 6, 2)}


def test_topk_per_group_prefilter_equals_exact_on_skewed_data(spark):
    """The approximate-threshold prefilter must not change the result:
    on a skewed distribution (one giant group, one tiny) the prefiltered
    path returns exactly the rows the plain window path returns."""
    from yougile_etl_pipeline_spark.operators.quality import topk_per_group

    rows = ([(i, "big", float(i % 97)) for i in range(3000)]
            + [(10_000 + i, "small", float(i)) for i in range(5)])
    df = spark.createDataFrame(
        rows, "doc_id long, source string, q double").repartition(7)
    exact = {(r.source, r.doc_id, r.rank)
             for r in topk_per_group(df, "source", "q", "doc_id",
                                     10).collect()}
    fast = {(r.source, r.doc_id, r.rank)
            for r in topk_per_group(df, "source", "q", "doc_id", 10,
                                    prefilter=True).collect()}
    assert fast == exact
    assert len({d for (s, d, _) in exact if s == "small"}) == 5


def test_bm25_ranks_matching_docs_and_rewards_rarity(spark):
    """BM25 sanity: docs containing query terms outscore docs without;
    a rare term contributes more than a ubiquitous one at equal tf."""
    from yougile_etl_pipeline_spark.operators.text import bm25_scores

    rows = [
        (1, "rare common filler filler"),   # rare + common
        (2, "common filler filler filler"),  # common only
        (3, "filler filler filler filler"),  # no query terms
        (4, "common x y z"),                 # common only (same tf as 2)
    ]
    out = {r.doc_id: r for r in bm25_scores(
        _docs(spark, rows), ["rare", "common"]).collect()}
    assert out[3].bm25 == 0.0 and out[3].n_query_terms_present == 0
    assert out[1].bm25 > out[2].bm25 > 0.0
    assert out[1].n_query_terms_present == 2
    # doc 2 and 4: same tf, same length -> identical score
    assert out[2].bm25 == out[4].bm25


def test_topk_per_group_prefilter_keeps_null_order_values(spark):
    """A giant group whose rows are mostly NULL-ordered must survive the
    percentile prefilter: the exact window sorts NULLs last but still
    keeps them when fewer than k non-NULL values exist (ADVICE r04)."""
    from yougile_etl_pipeline_spark.operators.quality import topk_per_group

    rows = ([(i, "big", float(i % 11) if i % 50 == 0 else None)
             for i in range(3000)]
            + [(10_000 + i, "small", float(i)) for i in range(3)])
    df = spark.createDataFrame(
        rows, "doc_id long, source string, q double").repartition(5)
    exact = {(r.source, r.doc_id, r.rank)
             for r in topk_per_group(df, "source", "q", "doc_id",
                                     100).collect()}
    fast = {(r.source, r.doc_id, r.rank)
            for r in topk_per_group(df, "source", "q", "doc_id", 100,
                                    prefilter=True).collect()}
    assert fast == exact
    # the big group has only 60 non-NULL q values; NULL rows must fill
    # the quota to k on both paths
    assert len({d for (s, d, _) in exact if s == "big"}) == 100


def test_bm25_empty_terms_raises(spark):
    import pytest

    from yougile_etl_pipeline_spark.operators.text import bm25_scores

    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(_docs(spark, [(1, "a b")]), [])
