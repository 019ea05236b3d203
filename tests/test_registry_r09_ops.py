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
