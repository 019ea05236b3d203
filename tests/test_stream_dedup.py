"""Streaming exact dedup (streaming/snapshot.py::dedup_keys_stream) —
ROUND-7 BANK. The surviving key set under an availableNow drain must
equal batch SELECT DISTINCT (the full surviving rows are arrival-
order-dependent; the key projection is the deterministic part, which
is why the staged entry can carry a real oracle instead of rows-only).
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.sources.tables import load_table
from yougile_etl_pipeline_spark.streaming.snapshot import (
    run_dedup_keys_available_now,
)

_ORACLE = "SELECT DISTINCT user_id, event_type FROM events"


def test_stream_dedup_matches_batch_distinct(spark):
    got = run_dedup_keys_available_now(
        spark, SF_SMOKE, table_name="stream_dedup_t1")
    batch = (load_table(spark, SF_SMOKE, "events")
             .select("user_id", "event_type").distinct())
    s = {(r["user_id"], r["event_type"]) for r in got.collect()}
    b = {(r["user_id"], r["event_type"]) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_stream_dedup_duckdb_parity(spark):
    got = run_dedup_keys_available_now(
        spark, SF_SMOKE, table_name="stream_dedup_t2")
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
