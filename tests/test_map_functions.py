"""Map-typed column functions (f_map_functions) — ROUND-7 BANK.

The one function family the registered surface didn't touch:
create_map / map_keys / map_values / map_entries / map_filter /
map_concat / transform_values / element_at / aggregate-over-values.
The engine side routes every output THROUGH map operations; the
oracle computes the same values from plain column arithmetic — maps
are engine-internal, the semantics are what's checked (same stance as
the media entries: the oracle never needs to see the intermediate
representation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.sources.tables import load_table

_ORACLE = """
SELECT event_id,
  CASE WHEN event_id % 2 = 0 AND user_id % 2 = 0 THEN 'eid,uid'
       WHEN event_id % 2 = 0 THEN 'eid'
       WHEN user_id % 2 = 0 THEN 'uid'
       ELSE '' END AS even_keys_csv,
  CAST(event_id + user_id AS BIGINT) AS vals_sum,
  CAST(user_id AS BIGINT) AS uid_lookup,
  CAST(event_id * 2 AS BIGINT) AS eid_doubled,
  CAST(3 AS INTEGER) AS merged_size,
  'eid=' || CAST(event_id AS BIGINT) || ';uid=' ||
    CAST(user_id AS BIGINT) AS entries_csv
FROM events
"""


def build(spark, sf):
    ev = load_table(spark, sf, "events").select("event_id", "user_id")
    m = F.create_map(
        F.lit("eid"), F.col("event_id").cast("bigint"),
        F.lit("uid"), F.col("user_id").cast("bigint"))
    even = F.map_filter(m, lambda k, v: v % 2 == 0)
    doubled = F.transform_values(m, lambda k, v: v * 2)
    merged = F.map_concat(m, F.create_map(F.lit("extra"),
                                          F.lit(7).cast("bigint")))
    entries = F.transform(
        F.sort_array(F.map_entries(m)),
        lambda e: F.concat(e["key"], F.lit("="),
                           e["value"].cast("string")))
    return ev.select(
        "event_id",
        F.concat_ws(",", F.sort_array(F.map_keys(even)))
         .alias("even_keys_csv"),
        F.aggregate(F.map_values(m), F.lit(0).cast("bigint"),
                    lambda acc, v: acc + v).alias("vals_sum"),
        F.element_at(m, "uid").alias("uid_lookup"),
        F.element_at(doubled, "eid").alias("eid_doubled"),
        F.size(merged).alias("merged_size"),
        F.concat_ws(";", entries).alias("entries_csv"))


def test_map_functions_semantics(spark):
    df = spark.createDataFrame([(3, 4), (2, 7)],
                               "event_id long, user_id long")
    m = F.create_map(
        F.lit("eid"), F.col("event_id").cast("bigint"),
        F.lit("uid"), F.col("user_id").cast("bigint"))
    even = F.map_filter(m, lambda k, v: v % 2 == 0)
    got = {r["event_id"]: r for r in df.select(
        "event_id",
        F.concat_ws(",", F.sort_array(F.map_keys(even))).alias("ek"),
        F.aggregate(F.map_values(m), F.lit(0).cast("bigint"),
                    lambda a, v: a + v).alias("s")).collect()}
    assert got[3]["ek"] == "uid" and got[3]["s"] == 7
    assert got[2]["ek"] == "eid" and got[2]["s"] == 9


def test_map_functions_duckdb_parity(spark):
    got = build(spark, SF_SMOKE)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
