"""Trailing-window distinct counting — staged round-6
`win_rolling_distinct`: per event, the distinct-user and event counts
of its type over the trailing 7 days (event-time RANGE frame, no
resampling). Spark has no DISTINCT window aggregate, so the engine
side is ``size(collect_set(...))`` over the same frame — set SIZE is
deterministic under any tie order, which is what makes the pairing
with DuckDB's native ``count(DISTINCT) OVER`` exact."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.sources.tables import load_table

_FRAME = ("PARTITION BY event_type ORDER BY ts "
          "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW")


def staged_query(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.selectExpr(
        "event_id", "event_type", "ts",
        f"count(*) OVER ({_FRAME}) AS n_events_7d",
        f"size(collect_set(user_id) OVER ({_FRAME})) AS n_users_7d")


_ORACLE = """
SELECT event_id, event_type, ts,
       count(*) OVER w AS n_events_7d,
       count(DISTINCT user_id) OVER w AS n_users_7d
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
"""


def test_rolling_distinct_duckdb_parity(spark):
    got = staged_query(spark, SF_SMOKE)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []


def test_distinct_lower_than_total_and_monotone_day_one(spark):
    rows = staged_query(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["n_users_7d"] <= r["n_events_7d"] for r in rows)
    # a repeat visit by the same user inside the frame must NOT bump
    # the distinct count: somewhere in the fixture the two differ
    assert any(r["n_users_7d"] < r["n_events_7d"] for r in rows)
