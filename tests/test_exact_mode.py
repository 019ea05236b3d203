"""exact_mode (operators/quality.py): deterministic tie-break, NULL
exclusion, and the staged round-6 `events_mode_type` DuckDB oracle,
proven BEFORE registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import exact_mode
from yougile_etl_pipeline_spark.sources.tables import load_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_plain_mode(spark):
    d = _df(spark, [(1, "a"), (1, "a"), (1, "b")])
    r = exact_mode(d, "k", "v").collect()[0]
    assert (r["mode"], r["mode_count"]) == ("a", 2)


def test_tie_break_largest_value(spark):
    d = _df(spark, [(1, "a"), (1, "b")])
    r = exact_mode(d, "k", "v").collect()[0]
    assert (r["mode"], r["mode_count"]) == ("b", 1)


def test_nulls_excluded_and_all_null_key_absent(spark):
    d = _df(spark, [(1, None), (1, None), (1, "z"), (2, None)])
    rows = {r["k"]: r for r in exact_mode(d, "k", "v").collect()}
    assert rows[1]["mode"] == "z"
    assert 2 not in rows


def test_partitioning_invariant(spark):
    d = _df(spark, [(k % 7, f"v{(k * 3) % 5}") for k in range(200)])
    run = lambda x: sorted(map(tuple, exact_mode(  # noqa: E731
        x, "k", "v").collect()))
    assert run(d.coalesce(1)) == run(d.repartition(13))


_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2),
ranked AS (
  SELECT user_id, event_type, c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY c DESC, event_type DESC) AS rn
  FROM counts)
SELECT user_id, event_type AS mode, c AS mode_count
FROM ranked WHERE rn = 1
"""


def test_exact_mode_duckdb_parity(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = exact_mode(ev, "user_id", "event_type")
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0
