"""Scale-pattern tests: bucketed co-located joins (no exchange), skew
salting equivalence, REST retry, alert runner, stateful streaming
sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.relational import salted_join
from yougile_etl_pipeline_spark.plans.runner import run_with_alerts
from yougile_etl_pipeline_spark.sources.rest import with_retry
from yougile_etl_pipeline_spark.sources.sinks import AlertSink
from yougile_etl_pipeline_spark.sources.tables import load_table
from yougile_etl_pipeline_spark.streaming.stateful import (
    run_sessionize_available_now,
)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Writing both sides bucketed by the join key makes the join
    exchange-free — the 100 TB co-location strategy (SCALE.md §Joins)."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").option("path", str(tmp_path / "bo"))
        .saveAsTable("b_orders"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", str(tmp_path / "bl"))
        .saveAsTable("b_lineitem"))
    # force SMJ (hint on the relation) so broadcast can't hide the exchange
    j = (spark.table("b_orders").hint("merge")
         .join(spark.table("b_lineitem"),
               F.col("o_orderkey") == F.col("l_orderkey")))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert j.count() == lineitem.count()     # every lineitem has its order


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders") \
        .select("o_orderkey", "o_custkey")
    cust = load_table(spark, SF_SMOKE, "customer") \
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    plain = orders.join(cust, "o_custkey")
    salted = salted_join(orders, cust, "o_custkey", salt=4)
    assert sorted(map(tuple, plain.collect())) == \
           sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched_once(spark):
    """Left join: unmatched big-side rows appear exactly once (the big side
    is salted, not replicated, so no ×salt duplication is possible)."""
    orders = load_table(spark, SF_SMOKE, "orders") \
        .select("o_orderkey", "o_custkey")
    cust = load_table(spark, SF_SMOKE, "customer") \
        .filter(F.col("c_custkey") % 2 == 0) \
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    plain = orders.join(cust, "o_custkey", "left")
    salted = salted_join(orders, cust, "o_custkey", how="left", salt=4)
    assert sorted(map(tuple, plain.collect())) == \
           sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer_joins(spark):
    """right/full would emit unmatched replicated-side rows once per salt —
    rejected explicitly instead of silently duplicating."""
    df = spark.range(4)
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(df, df, "id", how=how)


def test_with_retry_backs_off_then_succeeds():
    attempts = []
    sleeps = []

    def flaky(method, offset, limit, include_deleted, column_id):
        attempts.append(offset)
        if len(attempts) < 3:
            raise ConnectionError("boom")
        return {"content": [{"id": "1"}], "paging": {"next": False}}

    fetch = with_retry(flaky, retries=2, backoff_s=0.5,
                       sleep=sleeps.append)
    out = fetch("boards", 0, 10, "false", None)
    assert out["content"] == [{"id": "1"}]
    assert sleeps == [0.5, 1.0]            # exponential backoff

    def always_fails(*a):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        with_retry(always_fails, retries=1, sleep=lambda s: None)(
            "boards", 0, 10, "false", None)


def test_runner_soft_and_hard_alerts(spark):
    sent: list[str] = []
    alerts = AlertSink(sent.append)
    orphan_audit = spark.createDataFrame([(2,)], "orphan_count long")
    mart = spark.createDataFrame([(1,)], "x int")
    written = []
    out = run_with_alerts(lambda: (mart, orphan_audit), written.append,
                          alerts, job_name="j1")
    assert out is mart and written == [mart]       # D1 soft: loaded anyway
    assert len(sent) == 1 and "2 child rows" in sent[0]

    def boom():
        raise RuntimeError("extract exploded")

    with pytest.raises(RuntimeError):
        run_with_alerts(boom, written.append, alerts, job_name="j2")
    assert "j2" in sent[-1] and "extract exploded" in sent[-1]   # D4 hard


def test_stateful_sessionize_matches_batch(spark):
    """Closed sessions emitted by the stateful operator == batch lag-based
    sessions minus the one trailing open session per user."""
    from pyspark.sql.window import Window

    emitted = run_sessionize_available_now(spark, SF_SMOKE,
                                           "t_stateful_sessions")
    closed_per_user = {r.user_id: r.n for r in
                       emitted.groupBy("user_id")
                              .agg(F.count(F.lit(1)).alias("n")).collect()}

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "ms", F.unix_millis("ts"))
    w = Window.partitionBy("user_id").orderBy("ms")
    sess = (ev.withColumn("prev", F.lag("ms").over(w))
              .groupBy("user_id")
              .agg(F.count_if(F.col("prev").isNull() |
                              ((F.col("ms") - F.col("prev")) > 1800000))
                    .alias("sessions")))
    batch = {r.user_id: r.sessions for r in sess.collect()}
    for uid, n_sessions in batch.items():
        assert closed_per_user.get(uid, 0) == n_sessions - 1, uid
    # session event counts conserve total events
    total_emitted = emitted.agg(F.sum("n_events")).collect()[0][0] or 0
    assert total_emitted < ev.count()


def test_incremental_snapshots_latest_and_changes(spark, tmp_path):
    import datetime as dt

    from yougile_etl_pipeline_spark.plans.incremental import (
        append_snapshot,
        read_latest_snapshot,
        snapshot_changes,
    )

    path = str(tmp_path / "mart")
    mk = lambda rows, ts: spark.createDataFrame(
        [(k, v, ts) for k, v in rows],
        "task_id string, status string, loaded_ts timestamp")
    t1 = dt.datetime(2026, 1, 1, 5)
    t2 = dt.datetime(2026, 1, 2, 6)
    append_snapshot(mk([("A", "open"), ("B", "open")], t1), path)
    append_snapshot(mk([("A", "open"), ("B", "closed"), ("C", "open")], t2),
                    path)

    latest = read_latest_snapshot(spark, path)
    got = {(r.task_id, r.status) for r in latest.collect()}
    assert got == {("A", "open"), ("B", "closed"), ("C", "open")}

    hist = spark.read.parquet(path)
    changes = snapshot_changes(hist, ["task_id"], ["status"])
    per_key = {(r.task_id, r.loaded_ts) for r in changes.collect()}
    # A: first load only; B: first + change; C: first (in load 2)
    assert per_key == {("A", t1), ("B", t1), ("B", t2), ("C", t2)}


def test_interval_join_matches_naive(spark):
    from yougile_etl_pipeline_spark.operators.relational import interval_join

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "ms", F.unix_millis("ts"))
    a = ev.select("user_id", F.col("event_id").alias("a_id"), "ms")
    b = ev.select("user_id", F.col("event_id").alias("b_id"), "ms")
    banded = interval_join(a, b, keys=["user_id"], left_ts="ms",
                           right_ts="ms", max_gap_ms=600000)
    naive = (a.join(b.withColumnsRenamed({"b_id": "b_id", "ms": "ms_r"}),
                    "user_id")
             .filter((F.col("ms_r") > F.col("ms"))
                     & (F.col("ms_r") <= F.col("ms") + 600000)))
    assert sorted((r.a_id, r.b_id_r) for r in
                  banded.select("a_id", "b_id_r").collect()) == \
           sorted((r.a_id, r.b_id) for r in
                  naive.select("a_id", "b_id").collect())


def test_merge_upsert_partitioned_and_flat(spark, tmp_path):
    from yougile_etl_pipeline_spark.plans.incremental import merge_upsert

    mk = lambda rows: spark.createDataFrame(
        rows, "task_id string, status string, region string")

    # partitioned target: only touched partitions rewritten
    p = str(tmp_path / "part")
    merge_upsert(spark, p, mk([("A", "open", "eu"), ("B", "open", "eu"),
                               ("X", "open", "us")]),
                 ["task_id"], partition_col="region")
    merge_upsert(spark, p, mk([("B", "closed", "eu"), ("C", "open", "eu")]),
                 ["task_id"], partition_col="region")
    got = {(r.task_id, r.status, r.region)
           for r in spark.read.parquet(p).collect()}
    assert got == {("A", "open", "eu"), ("B", "closed", "eu"),
                   ("C", "open", "eu"), ("X", "open", "us")}

    # flat target: staging swap
    f = str(tmp_path / "flat")
    merge_upsert(spark, f, mk([("A", "open", "eu")]), ["task_id"])
    merge_upsert(spark, f, mk([("A", "closed", "eu"), ("B", "open", "us")]),
                 ["task_id"])
    got = {(r.task_id, r.status) for r in spark.read.parquet(f).collect()}
    assert got == {("A", "closed"), ("B", "open")}


def test_merge_upsert_key_moving_partitions(spark, tmp_path):
    """An update that moves a key to a different partition_col value must
    rewrite the key's OLD partition too — otherwise the stale row survives
    there and the business key is duplicated."""
    from yougile_etl_pipeline_spark.plans.incremental import merge_upsert

    mk = lambda rows: spark.createDataFrame(
        rows, "task_id string, status string, region string")
    p = str(tmp_path / "mv")
    merge_upsert(spark, p, mk([("A", "open", "eu"), ("B", "open", "us")]),
                 ["task_id"], partition_col="region")
    merge_upsert(spark, p, mk([("A", "closed", "us")]),   # A: eu → us
                 ["task_id"], partition_col="region")
    rows = spark.read.parquet(p).collect()
    assert {(r.task_id, r.status, r.region) for r in rows} == \
        {("A", "closed", "us"), ("B", "open", "us")}
    keys = [r.task_id for r in rows]
    assert len(keys) == len(set(keys)), "duplicate business keys"


def test_merge_upsert_crash_recovery(spark, tmp_path):
    """A crash between swap steps leaves either the old or the new mart
    recoverable; recover_merge_target repairs the directory."""
    import os
    import shutil

    from yougile_etl_pipeline_spark.plans.incremental import (
        merge_upsert,
        recover_merge_target,
    )

    mk = lambda rows: spark.createDataFrame(rows, "task_id string, v int")
    f = str(tmp_path / "m")
    staging, backup = f + "__staging", f + "__old"
    merge_upsert(spark, f, mk([("A", 1)]), ["task_id"])

    # crash AFTER the live tree moved aside (staging complete):
    mk([("A", 2)]).write.mode("overwrite").parquet(staging)
    os.rename(f, backup)
    assert recover_merge_target(f) == "promoted_staging"
    assert [r.v for r in spark.read.parquet(f).collect()] == [2]
    assert not os.path.exists(staging) and not os.path.exists(backup)

    # crash with an INCOMPLETE staging (no _SUCCESS): old tree restored
    shutil.copytree(f, staging)
    os.remove(os.path.join(staging, "_SUCCESS"))
    os.rename(f, backup)
    assert recover_merge_target(f) == "restored_backup"
    assert [r.v for r in spark.read.parquet(f).collect()] == [2]
    assert not os.path.exists(staging) and not os.path.exists(backup)

    # no crash: live tree intact, stray temps cleaned
    os.makedirs(staging)
    assert recover_merge_target(f) == "clean"
    assert not os.path.exists(staging)


def test_snapshot_diff_all_statuses_and_null_safety(spark):
    from yougile_etl_pipeline_spark.plans.incremental import snapshot_diff
    old = spark.createDataFrame(
        [(1, 10.0, "A"),          # unchanged
         (2, 20.0, "A"),          # price changes
         (3, None, "B"),          # NULL -> value = changed (null-safe)
         (4, 40.0, "C"),          # removed
         (5, 50.0, "D")],         # both cols change
        "k int, price double, status string")
    new = spark.createDataFrame(
        [(1, 10.0, "A"),
         (2, 25.0, "A"),
         (3, 3.5, "B"),
         (5, 55.0, "E"),
         (6, 60.0, "F")],         # added
        "k int, price double, status string")
    out = {r.k: (r.status, r.changed_cols)
           for r in snapshot_diff(old, new, ["k"],
                                  ["price", "status"]).collect()}
    assert out[1] == ("unchanged", "")
    assert out[2] == ("changed", "price")
    assert out[3] == ("changed", "price")
    assert out[4] == ("removed", "")
    assert out[5] == ("changed", "price,status")   # tracked-list order
    assert out[6] == ("added", "")


def test_aqe_splits_skewed_join_at_runtime(spark):
    """session.py turns on AQE skew-join splitting as the no-code-change
    answer to hot keys; prove OptimizeSkewedJoin actually fires: a join
    with one hot key executes with SortMergeJoin(skew=true) once the
    hot partition crosses the (lowered) threshold."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # ~75% of 120k rows pile on key 0; the rest spread over 97 keys
        left = spark.range(0, 120_000).select(
            F.when(F.col("id") % 4 != 0, F.lit(0))
             .otherwise(F.col("id") % 97 + 1).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("pad"))
        right = spark.range(0, 98).select(F.col("id").alias("k"),
                                          F.lit("r").alias("rv"))
        j = left.join(right, "k")
        n = len(j.collect())
        assert n == 120_000                       # hot key matched too
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan                # the split really ran
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """DPP: a selective dim filter must prune the partitioned fact's scan
    at RUNTIME (the broadcast result seeds a partition filter subquery) —
    at 100 TB this is the difference between scanning 2 of 1000
    date-partitions and scanning them all. The plan must carry a
    dynamicpruning expression on the fact scan."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "fact")
    (spark.range(0, 50_000)
     .select(F.col("id"), (F.col("id") % 20).alias("pt"))
     .write.partitionBy("pt").parquet(path))
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(20)],
        "pt long, flag string")

    j = fact.join(dim.filter(F.col("flag") == "keep"), "pt")
    plan = j._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan
    assert j.count() == 5_000      # 2 of 20 partitions survive


def test_transform_with_state_running_totals_match_batch(spark):
    """transformWithStateInPandas (Spark 4 stateful API): after one
    availableNow drain, the LAST update per user equals the batch
    groupBy — integer-micros state makes the comparison exact, not
    approximate. Requires the protobuf package (the API's state-server
    protocol) — skipped where absent."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql.window import Window

    from yougile_etl_pipeline_spark.streaming.stateful import (
        run_running_totals_available_now,
    )

    out = run_running_totals_available_now(spark, SF_SMOKE)
    # update mode may emit one row per micro-batch per user: keep the
    # row with the highest n_events (the final state) per user
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (out.withColumn("__r", F.row_number().over(w))
             .filter("__r = 1").drop("__r"))
    ev = load_table(spark, SF_SMOKE, "events")
    # same half-up floor(x*1e6 + 0.5) formula as the operator's state
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1_000_000
                      + 0.5).cast("long")).alias("total_value_micros"))
    got = {(r.user_id, r.n_events, r.total_value_micros)
           for r in final.collect()}
    want = {(r.user_id, r.n_events, r.total_value_micros)
            for r in batch.collect()}
    assert want and got == want
