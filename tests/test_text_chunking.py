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
