"""Event path mining (staged round-6 `events_top_paths`): per-user
ordered event-type trigrams via two leads, corpus-level top-25 with a
lexicographic tie-break. Oracle proven BEFORE registration."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.sources.tables import load_table


def top_paths(events, k: int = 25):
    """Behavioral path mining: each user's event stream in (ts,
    event_id) total order yields one trigram per position (two lead()
    calls sharing ONE user-keyed window shuffle); corpus counting is a
    bounded partial agg (≤ |event_types|³ keys) and top-k is
    TakeOrderedAndProject with the path string as tie-break — fully
    deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (events.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"))
         .filter(F.col("e1").isNotNull() & F.col("e2").isNotNull()
                 & F.col("e3").isNotNull()))
    return (t.select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
             .groupBy("path")
             .agg(F.count(F.lit(1)).alias("n"))
             .orderBy(F.col("n").desc(), F.col("path"))
             .limit(k))


_ORACLE = """
WITH t AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
FROM t WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 25
"""


def test_top_paths_duckdb_parity(spark):
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("user_id", "ts", "event_id", "event_type")
    got = top_paths(ev)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    assert got.count() == 25


def test_paths_are_per_user_ordered(spark):
    rows = [(1, i, f"2024-01-01 00:0{i}:00", t) for i, t in
            enumerate(["a", "b", "c", "d"])] + \
           [(2, 10, "2024-01-01 00:00:00", "x")]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).selectExpr("user_id", "event_id", "cast(ts as timestamp) ts",
                 "event_type")
    got = {r["path"]: r["n"] for r in top_paths(ev).collect()}
    # user 1 contributes a>b>c and b>c>d; user 2 is too short
    assert got == {"a>b>c": 1, "b>c>d": 1}
