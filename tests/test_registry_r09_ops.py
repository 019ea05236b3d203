"""Per-op parity + plan-shape tests for the round-9 registrations
(yougile_etl_pipeline_spark/registry_r09.py). Every entry's oracle is
proven bit-identical at SF_SMOKE here; scripts/check_queries.py
re-proves the registered copy at the driver's sf0.01.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect


def _parity(spark, name):
    from yougile_etl_pipeline_spark.registry import ORACLES, QUERIES

    con = duck_connect(SF_SMOKE)
    issues = compare(QUERIES[name](spark, SF_SMOKE), con, ORACLES[name])
    assert not issues, f"{name}: {issues}"


def _plan(spark, name):
    from yougile_etl_pipeline_spark.registry import QUERIES

    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def test_sample_reservoir_per_lang_parity(spark):
    _parity(spark, "sample_reservoir_per_lang")


def test_sample_reservoir_per_lang_plan(spark):
    # grouped_topk's partition-local combiner must be present — the
    # same no-single-task-sorts-a-language pin as the capstone quota.
    plan = _plan(spark, "sample_reservoir_per_lang")
    assert "MapInPandas" in plan


def test_corpus_mixture_rebalance_parity(spark):
    _parity(spark, "corpus_mixture_rebalance")


def test_corpus_mixture_rebalance_plan(spark):
    # 100 TB pin: the rate table broadcasts onto the corpus — the big
    # side must NOT shuffle for the join (no SortMergeJoin anywhere;
    # the only exchanges are the tiny per-lang aggregates).
    plan = _plan(spark, "corpus_mixture_rebalance")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_corpus_mixture_rebalance_keeps_smallest_group_whole(spark):
    # The smallest language's quantized rate is exactly `buckets`,
    # so it must survive rebalancing untouched.
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.operators.quality import (
        mixture_rebalance,
    )

    rows = [(i, "big", 10) for i in range(200)] + \
           [(1000 + i, "small", 10) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    kept = mixture_rebalance(df, "lang", "w", "doc_id")
    per = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    assert per.get("small") == 7
    assert 0 < per.get("big", 0) < 200


def test_events_hopping_counts_parity(spark):
    _parity(spark, "events_hopping_counts")


def test_text_bpe_roundtrip_parity(spark):
    _parity(spark, "text_bpe_roundtrip")


def test_text_bpe_roundtrip_merges_actually_fire(spark):
    # The differential is vacuous if no merge ever applies — prove the
    # fixed merge table produces multi-char tokens on common words.
    from yougile_etl_pipeline_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([("the",), ("ring",), ("sand",)],
                               "word string")
    merges = [("t", "h"), ("e", "</w>"), ("th", "e</w>"), ("a", "n"),
              ("i", "n"), ("o", "r"), ("r", "e"), ("s", "</w>"),
              ("in", "g"), ("an", "d</w>")]
    got = {r["word"]: r["toks"] for r in
           bpe_encode(df, merges, word_col="word",
                      out_col="toks").collect()}
    assert got["the"] == ["the</w>"]
    assert got["ring"] == ["r", "ing", "</w>"] or \
        any(len(t) > 1 for t in got["ring"])
    assert any(len(t) > 1 for t in got["sand"])


def test_stream_dedup_static_store_parity(spark):
    _parity(spark, "stream_dedup_static_store")


def test_mm_bmp_palette8_parity(spark):
    _parity(spark, "mm_bmp_palette8")


def test_bmp_pal8_codec_roundtrip_unit():
    # Direct codec unit: non-identity palette must change the stats
    # vs raw indices, top-down files decode identically, and padding
    # is excluded (w=5 forces a 3-byte pad per row).
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        bmp_encode_pal8,
        bmp_pal8_decode,
    )

    idx = np.arange(15, dtype=np.uint8).reshape(3, 5)
    i = np.arange(256, dtype=np.int64)
    pal = np.stack([(3 * i + 1) % 256, (5 * i + 2) % 256,
                    (7 * i + 3) % 256], axis=1).astype(np.uint8)
    got = bmp_pal8_decode(bmp_encode_pal8(idx, pal))
    resolved = pal[idx].astype(np.int64)
    assert got["width"] == 5 and got["height"] == 3
    assert got["px_sum"] == int(resolved.sum())
    assert got["px_min"] == int(resolved.min())
    assert got["px_max"] == int(resolved.max())
    assert got["px_sum"] != int(idx.astype(np.int64).sum())  # real lookup


def test_events_asof_nearest_parity(spark):
    _parity(spark, "events_asof_nearest")


def test_events_asof_nearest_prefers_backward_on_tie(spark):
    # Synthetic tie: clicks equidistant before/after the purchase —
    # the earlier (backward) click must win; and among equal-ts
    # clicks the greatest event_id wins on BOTH sides.
    import datetime as dt

    from yougile_etl_pipeline_spark.registry import QUERIES  # noqa: F401
    from yougile_etl_pipeline_spark.operators.relational import asof_join

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, sec)

    rows = [(1, ts(10), 7, "click", 0.0, None),
            (2, ts(10), 7, "click", 0.0, None),   # same ts, bigger id
            (3, ts(30), 7, "click", 0.0, None),
            (9, ts(20), 7, "purchase", 0.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    from pyspark.sql import functions as F
    ev = df.withColumn("ms", F.unix_millis("ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ms", "event_id",
                        (-F.col("event_id")).alias("neg_id")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select(F.col("event_id").alias("purchase_id"),
                           "user_id", F.col("ms").alias("purchase_ms")))
    back = asof_join(purchases, clicks, on="user_id",
                     left_ts="purchase_ms", right_ts="ms",
                     right_cols=["event_id"], suffix="_b",
                     direction="backward")
    both = asof_join(back, clicks, on="user_id",
                     left_ts="purchase_ms", right_ts="ms",
                     right_cols=["event_id", "neg_id"], suffix="_f",
                     tiebreak="neg_id", direction="forward")
    d_b = F.col("purchase_ms") - F.col("ms_b")
    d_f = F.col("ms_f") - F.col("purchase_ms")
    take_back = F.col("ms_b").isNotNull() & (
        F.col("ms_f").isNull() | (d_b <= d_f))
    out = both.select(
        F.when(take_back, F.col("event_id_b"))
         .otherwise(F.col("event_id_f")).alias("click_id")).collect()
    assert len(out) == 1 and out[0]["click_id"] == 2


def test_events_resample_interpolate_parity(spark):
    _parity(spark, "events_resample_interpolate")


def test_resample_interpolate_unit(spark):
    # Hand-checkable grid: anchors at hours 0 (v=10) and 3 (v=40) →
    # hours 1/2 interpolate to 20/30; a leading-gap key falls back
    # to its single anchor on both sides of it.
    import datetime as dt

    from yougile_etl_pipeline_spark.operators.relational import (
        resample_interpolate,
    )

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [(1, ts(0, 30), 7, "e", 10.0, None),
            (2, ts(3, 10), 7, "e", 40.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["h"].hour: r["value_interp"]
           for r in resample_interpolate(
               df, "user_id", "ts", "value").collect()}
    assert out == {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0}


def test_graph_pagerank_personalized_parity(spark):
    _parity(spark, "graph_pagerank_personalized")


def test_pagerank_personalized_mass_at_seeds(spark):
    # Non-seed sources with no in-edges must hold rank 0; seeds must
    # hold at least the teleport base; empty seed set → all-zero.
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.operators.graph import (
        pagerank_personalized,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    ranks = {r["node"]: r["rank"]
             for r in pagerank_personalized(edges, seeds,
                                            iterations=3).collect()}
    assert ranks[4] == 0                       # unreachable from seed
    assert ranks[1] >= 15 * 10**12 // 100      # teleport base held
    assert ranks[2] > 0 and ranks[3] > 0       # mass flowed 1→2→3
    empty = pagerank_personalized(
        edges, spark.createDataFrame([(99,)], "node long"))
    assert empty.agg(F.max("rank")).first()[0] == 0


def test_stream_hopping_counts_parity(spark):
    # The streaming twin shares the batch entry's oracle — an
    # availableNow complete-mode drain must equal the batch rollup.
    _parity(spark, "stream_hopping_counts")


def test_events_stickiness_dau_mau_parity(spark):
    _parity(spark, "events_stickiness_dau_mau")


def test_stickiness_bounds(spark):
    # 1/n_days <= stickiness <= 1 by construction (each day's DAU is
    # between 1-user-overlap and the month's full MAU).
    from yougile_etl_pipeline_spark.registry import QUERIES

    for r in QUERIES["events_stickiness_dau_mau"](
            spark, SF_SMOKE).collect():
        assert 0 < r["stickiness"] <= 1.0
        assert r["sum_dau"] >= r["mau"] or r["n_days"] == 1


def test_corpus_dedup_rate_report_parity(spark):
    _parity(spark, "corpus_dedup_rate_report")


def test_events_hopping_counts_every_event_in_three_windows(spark):
    # 30-min windows hopping every 10 min: total across windows must
    # be exactly 3x the event count.
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.registry import QUERIES
    from yougile_etl_pipeline_spark.sources.tables import load_table

    total = (QUERIES["events_hopping_counts"](spark, SF_SMOKE)
             .agg(F.sum("n")).first()[0])
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert total == 3 * n_events
