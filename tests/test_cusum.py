"""cusum_fixed_point (operators/timeseries.py): hand-checked
recurrence, alarm/reset semantics, partitioning invariance, and the
staged round-6 `events_cusum_alarms` DuckDB recursive-CTE oracle,
proven BEFORE registration."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.timeseries import (
    cusum_fixed_point,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _df(spark, vals):
    return spark.createDataFrame(
        [(1, i + 1, float(v)) for i, v in enumerate(vals)],
        "user_id long, event_id long, value double")


def test_hand_computed_recurrence(spark):
    # k=2, h=5 (units: S=100 -> 200, 500). x=[3,3,3]:
    # raw1=max(0,300-200)=100; raw2=100+300-200=200; raw3=300
    out = cusum_fixed_point(_df(spark, [3, 3, 3]), "user_id",
                            ["event_id"], "value",
                            drift=2.0, threshold=5.0)
    got = {r.event_id: (r.cusum, r.is_alarm) for r in out.collect()}
    assert got == {1: (1.0, False), 2: (2.0, False), 3: (3.0, False)}


def test_alarm_fires_and_resets(spark):
    # k=0, h=5: x=[3,3,3] -> raw 3,6(alarm,reset),3
    out = cusum_fixed_point(_df(spark, [3, 3, 3]), "user_id",
                            ["event_id"], "value",
                            drift=0.0, threshold=5.0)
    got = {r.event_id: (r.cusum, r.is_alarm) for r in out.collect()}
    assert got == {1: (3.0, False), 2: (6.0, True), 3: (3.0, False)}


def test_statistic_never_negative(spark):
    out = cusum_fixed_point(_df(spark, [-10, -10, 1]), "user_id",
                            ["event_id"], "value",
                            drift=0.0, threshold=100.0)
    assert all(r.cusum >= 0 for r in out.collect())


def test_invalid_params_raise(spark):
    d = _df(spark, [1])
    with pytest.raises(ValueError):
        cusum_fixed_point(d, "user_id", ["event_id"], "value",
                          drift=0.0, threshold=0.0)
    with pytest.raises(ValueError):
        cusum_fixed_point(d, "user_id", ["event_id"], "value",
                          drift=0.0, threshold=1.0, value_scale=0)


def test_partitioning_invariant(spark):
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("user_id", "ts", "event_id", "value")
    run = lambda d: {(r.user_id, r.event_id): (r.cusum, r.is_alarm)  # noqa: E731
                     for r in cusum_fixed_point(
                         d, "user_id", ["ts", "event_id"], "value",
                         drift=60.0, threshold=300.0).collect()}
    a, b = run(ev.coalesce(1)), run(ev.repartition(23))
    assert a == b and len(a) > 0


# staged r06 oracle: k=6000 units (drift 60.00), h=30000 units
# (threshold 300.00) over (user_id, ts, event_id) order — the same
# integer recurrence as a recursive CTE.
_ORACLE = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
cs AS (
  SELECT user_id, event_id, rn,
         greatest(0, v - 6000) AS raw,
         CASE WHEN greatest(0, v - 6000) > 30000 THEN 0
              ELSE greatest(0, v - 6000) END AS carry
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_id, n.rn,
         greatest(0, cs.carry + n.v - 6000),
         CASE WHEN greatest(0, cs.carry + n.v - 6000) > 30000 THEN 0
              ELSE greatest(0, cs.carry + n.v - 6000) END
  FROM cs JOIN seq n ON n.user_id = cs.user_id AND n.rn = cs.rn + 1)
SELECT user_id, event_id,
       CAST(raw AS DOUBLE) / 100.0 AS cusum,
       raw > 30000 AS is_alarm
FROM cs
"""


def test_cusum_duckdb_parity(spark):
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("user_id", "ts", "event_id", "value")
    out = (cusum_fixed_point(ev, "user_id", ["ts", "event_id"],
                             "value", drift=60.0, threshold=300.0)
           .select("user_id", "event_id", "cusum", "is_alarm"))
    con = duck_connect(SF_SMOKE)
    issues = compare(out, con, _ORACLE)
    assert not issues, issues
    # the fixture must actually exercise the alarm branch
    assert out.filter("is_alarm").count() > 0
