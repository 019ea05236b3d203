"""Behavioral tests for the round-5 registry additions — semantics the
DuckDB hash-compare alone can't localize when it fails: the exact-
sufficient-stats correlation against an independent numpy computation,
partitioning invariance of the windowed ops, and the calendar-function
edge mappings."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.registry import QUERIES


def test_agg_corr_exact_matches_numpy(spark):
    import numpy as np

    out = {r.event_type: r
           for r in QUERIES["agg_corr_exact"](spark, SF_SMOKE).collect()}
    ev = QUERIES["p2_projection"]  # noqa: F841  (style anchor only)
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select("event_type", "value", "user_id").collect())
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.value, r.user_id))
    for et, pairs in by_type.items():
        v = np.array([p[0] for p in pairs])
        u = np.array([p[1] for p in pairs], dtype=float)
        want_corr = float(np.corrcoef(v, u)[0, 1])
        want_sd = float(np.std(v, ddof=1))
        got = out[et]
        assert math.isclose(got.corr_value_user, want_corr,
                            rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(got.stddev_value, want_sd, rel_tol=1e-9)


def test_win_moving_avg_partitioning_invariant(spark):
    # identical output rows at 1 partition and 13 partitions — the
    # DECIMAL frame sums and the (ts, event_id) total order must make
    # the result independent of physical layout
    base = QUERIES["win_moving_avg"](spark, SF_SMOKE)
    one = {tuple(r) for r in base.coalesce(1).collect()}
    many = {tuple(r) for r in base.repartition(13).collect()}
    assert one == many and len(one) > 0


def test_f_datetime_truncs_known_values(spark):
    df = spark.createDataFrame(
        # Wed 2024-02-14 and Sun 2024-12-29 (ISO weekday 3 and 7)
        [(1, dt.datetime(2024, 2, 14, 13, 45, 7)),
         (2, dt.datetime(2024, 12, 29, 0, 0, 1))],
        "event_id long, ts timestamp")
    # write micros, not Spark's default INT96: the engine's loader
    # footer-sniffs ts for the nanos fixture variant, and pyarrow
    # reports INT96 as timestamp[ns] which would misroute the read
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        df.coalesce(1).write.mode("overwrite") \
            .parquet("/tmp/r05_dt_events/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = {r.event_id: r for r in QUERIES["f_datetime_truncs"](
        spark, "/tmp/r05_dt_events").collect()}
    assert out[1].week_start == "2024-02-12"       # Monday
    assert out[1].month_end == "2024-02-29"        # leap February
    assert out[1].quarter_start == "2024-01-01"
    assert out[1].weekday_iso == 3
    assert out[2].weekday_iso == 7                 # Sunday is 7, not 0
    assert out[2].quarter_start == "2024-10-01"


def test_dedup_normalized_exact_collapses_case_and_punct(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "HELLO WORLD."),
         (4, "a different doc")],
        "doc_id long, text string")
    docs.write.mode("overwrite") \
        .parquet("/tmp/r05_norm_docs/documents.parquet")
    out = QUERIES["dedup_normalized_exact"](spark, "/tmp/r05_norm_docs") \
        .collect()
    by_keep = {r.keep_doc: r.group_size for r in out}
    assert by_keep == {1: 3, 4: 1}


def test_bigram_topk_counts_known_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],  # 1-token doc: no grams
        "doc_id long, text string")
    docs.write.mode("overwrite") \
        .parquet("/tmp/r05_gram_docs/documents.parquet")
    out = {r.bigram: r.n for r in QUERIES["text_ngram_topk"](
        spark, "/tmp/r05_gram_docs").collect()}
    assert out == {"a b": 3, "b a": 1, "b c": 1}


def test_agg_minby_maxby_breaks_price_ties_by_orderkey(spark):
    orders = spark.createDataFrame(
        [(5, "O", 100.0), (3, "O", 100.0), (9, "O", 50.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double")
    orders.write.mode("overwrite") \
        .parquet("/tmp/r05_tie_orders/orders.parquet")
    r = QUERIES["agg_minby_maxby"](spark, "/tmp/r05_tie_orders").collect()
    assert len(r) == 1
    # tied max price 100.0 -> larger orderkey wins max_by, min price is
    # unique -> orderkey 9
    assert r[0].best_order == 5 and r[0].worst_order == 9
    assert r[0].max_price == 100.0 and r[0].min_price == 50.0
