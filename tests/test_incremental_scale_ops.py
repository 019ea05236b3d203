"""Behavioral tests for the incremental-scale operators beyond their
oracle checks: Bloom-prefilter exactness, mergeable-aggregate
equivalence, and the LM quality signal actually separating gibberish
from prose."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.dedup import (
    build_fp_bloom,
    dedup_incremental,
    dedup_incremental_bloom,
)
from yougile_etl_pipeline_spark.operators.text import (
    fingerprint_exact,
    lm_quality_score,
    train_char_lm,
)
from yougile_etl_pipeline_spark.plans.incremental import (
    merge_aggregates,
    partial_aggregate,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def _verdicts(df):
    return {(r.doc_id, r.status) for r in df.collect()}


@pytest.mark.parametrize("m_bits", [1 << 10, 1 << 20])
def test_bloom_result_identical_at_any_fpp(spark, docs, m_bits):
    """The bitmap is a prefilter, not a semantics change: with m_bits
    = 2^10 the filter is saturated (fpp → 1, nothing pruned) and with
    2^20 it prunes most of the batch — the verdicts must be identical
    to the exact operator in BOTH regimes."""
    m = F.col("doc_id") % 4
    batch = docs.filter(m.isin(0, 1)).limit(200)
    known = (docs.filter(m.isin(1, 2)).limit(200)
             .select(fingerprint_exact("text").alias("fp")))
    exact = _verdicts(dedup_incremental(batch, known))
    bloom = _verdicts(dedup_incremental_bloom(batch, known, m_bits=m_bits))
    assert bloom == exact


def test_bloom_no_false_negatives(spark, docs):
    """Every fingerprint folded into the bitmap must probe positive —
    the property that makes the prefilter exact. Checked by running the
    store itself through the probe path: nothing may come out 'new'."""
    known = docs.limit(300).select(fingerprint_exact("text").alias("fp"))
    out = dedup_incremental_bloom(
        docs.limit(300), known, m_bits=1 << 18)
    assert out.filter(F.col("status") == "new").count() == 0


def test_bloom_bitmap_prunes(spark, docs):
    """With a well-sized bitmap, a batch disjoint from the store probes
    almost entirely negative (the 1/fpp shuffle-collapse the operator
    exists for). Measured through the probe column itself."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.dedup import _bloom_positions

    known = (docs.filter(F.col("doc_id") % 4 == 2).limit(500)
             .select(fingerprint_exact("text").alias("fp")))
    m_bits = 1 << 20
    bits = np.frombuffer(build_fp_bloom(known, m_bits=m_bits),
                         dtype=np.uint8)
    # disjoint probes: synthetic fingerprints never inserted
    import pandas as pd
    probes = pd.Series([f"deadbeef{i:024x}" for i in range(2000)])
    pos = _bloom_positions(probes, m_bits)
    hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8)))
    fp_rate = float((hit != 0).all(axis=1).mean())
    assert fp_rate < 0.05


# ---------------------------------------------------------------------------
# Mergeable incremental aggregation
# ---------------------------------------------------------------------------

def test_merge_equals_full_recompute(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    keys, vcol = ["o_orderstatus"], "o_totalprice"
    full = merge_aggregates(
        partial_aggregate(orders, keys, vcol),
        partial_aggregate(orders.limit(0), keys, vcol), keys)

    third = F.col("o_orderkey") % 3
    merged = merge_aggregates(
        merge_aggregates(
            partial_aggregate(orders.filter(third == 0), keys, vcol),
            partial_aggregate(orders.filter(third == 1), keys, vcol),
            keys).select("o_orderstatus", "cnt", "total", "min_v", "max_v"),
        partial_aggregate(orders.filter(third == 2), keys, vcol), keys)

    a = {r.o_orderstatus: (r.cnt, r.total, r.min_v, r.max_v, r.mean_v)
         for r in full.collect()}
    b = {r.o_orderstatus: (r.cnt, r.total, r.min_v, r.max_v, r.mean_v)
         for r in merged.collect()}
    assert a == b  # bitwise: exact decimal state makes order irrelevant


# ---------------------------------------------------------------------------
# LM quality score
# ---------------------------------------------------------------------------

def test_lm_score_separates_gibberish(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog near the "
                "river bank while the sun sets over the quiet town")
            for i in range(20)]
    rows += [(100, "xq zvvk jjw qqxz pzv wkkj zzqx vjq kwzz qjx vxkq zwj")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {r.doc_id: r.lm_score
              for r in lm_quality_score(docs).collect()}
    prose = min(v for k, v in scores.items() if k < 100)
    assert scores[100] < prose / 5


def test_lm_external_model_and_short_docs(spark):
    lm = train_char_lm(spark.createDataFrame(
        [(1, "aaaa bbbb aaaa")], "doc_id long, text string"))
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "zz")], "doc_id long, text string")
    out = lm_quality_score(docs, lm).collect()
    # doc 2 has <3 chars -> no trigrams -> excluded, not crashed;
    # doc 1 scores against the external LM
    assert [r.doc_id for r in out] == [1]


def test_lm_plan_broadcasts_model(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = lm_quality_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # model side never shuffles the scan


def test_delta_join_algebra_exact(spark):
    """old ∪ delta == full join, as MULTISETS (exceptAll empty both
    ways) — appending the delta to the stored join is equivalent to
    recomputing it, duplicates included."""
    from yougile_etl_pipeline_spark.plans.incremental import delta_join

    a = spark.createDataFrame(
        [(1, "a1"), (1, "a1b"), (2, "a2"), (3, "a3")], "k int, va string")
    da = spark.createDataFrame([(2, "a2new"), (4, "a4")], "k int, va string")
    b = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b2b"), (4, "b4")], "k int, vb string")
    db = spark.createDataFrame([(1, "b1new"), (3, "b3")], "k int, vb string")

    full = a.unionByName(da).join(b.unionByName(db), "k") \
        .select("k", "va", "vb")
    old = a.join(b, "k").select("k", "va", "vb")
    delta = delta_join(a, da, b, db, "k").select("k", "va", "vb")
    recomposed = old.unionByName(delta)
    assert recomposed.exceptAll(full).count() == 0
    assert full.exceptAll(recomposed).count() == 0
    # delta == full \ old as multisets (the oracle's EXCEPT ALL
    # definition): old rows never re-emit, genuine gains never drop
    gain = full.exceptAll(old)
    assert delta.exceptAll(gain).count() == 0
    assert gain.exceptAll(delta).count() == 0
