"""Unit tests for the pandas-parity gotcha operators (SURVEY.md §7 risk
register): P6 null-keeping filter, R2 outer explode, P4 conform, F3/F5/F6
scalar edges — each silently wrong under naive Spark translation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from yougile_etl_pipeline_spark.functions.scalar import (
    clean_numeric,
    epoch_ms_to_date,
    parse_ddmmyyyy,
    split_range,
    strip_spaces,
)
from yougile_etl_pipeline_spark.operators.relational import (
    null_safe_neq,
    union_by_name,
)
from yougile_etl_pipeline_spark.operators.reshape import explode_keep_empty
from yougile_etl_pipeline_spark.schemas import conform


def test_null_safe_neq_keeps_nulls(spark):
    # pandas: df[df.deleted != True] keeps NaN rows (dag.py:239); Spark's
    # plain != drops them.
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, None)], "id int, deleted boolean")
    kept = df.filter(null_safe_neq("deleted", True)).select("id")
    assert {r.id for r in kept.collect()} == {2, 3}
    naive = df.filter(F.col("deleted") != True)  # noqa: E712
    assert {r.id for r in naive.collect()} == {2}  # documents the trap


def test_explode_keep_empty_preserves_parents(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)],
        "id int, xs array<string>")
    out = explode_keep_empty(df, "xs", "x").collect()
    assert {(r.id, r.x) for r in out} == {(1, "a"), (1, "b"), (2, None),
                                          (3, None)}


def test_conform_adds_missing_reorders_drops(spark):
    target = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("missing", T.StringType()),
        T.StructField("b", T.DoubleType()),
    ])
    df = spark.createDataFrame([(1.5, 7, "extra")], "b double, a long, junk string")
    out = conform(df, target)
    assert out.columns == ["a", "missing", "b"]
    row = out.collect()[0]
    assert (row.a, row.missing, row.b) == (7, None, 1.5)
    # idempotent: conforming an already-conformed frame is a no-op
    assert conform(out, target).collect() == out.collect()


def test_split_range_missing_second_part(spark):
    df = spark.createDataFrame([("01.02.2024-03.02.2024",), ("01.02.2024",)],
                               "s string")
    a, b = split_range("s")
    rows = df.select(a.alias("a"), b.alias("b")).collect()
    assert rows[0].a == "01.02.2024" and rows[0].b == "03.02.2024"
    assert rows[1].a == "01.02.2024" and rows[1].b is None  # pandas parity


def test_parse_ddmmyyyy_permissive(spark):
    df = spark.createDataFrame([("05.03.2024",), ("31.02.2024",), ("junk",)],
                               "s string")
    rows = df.select(parse_ddmmyyyy("s").alias("d")).collect()
    assert rows[0].d == dt.date(2024, 3, 5)
    assert rows[1].d is None and rows[2].d is None


def test_epoch_ms_to_date_utc_floor(spark):
    # 2024-02-01T23:59:59.999Z must floor to 2024-02-01 (UTC), not roll
    # into Feb 2 via a session timezone.
    df = spark.createDataFrame([(1706831999999,)], "ms long")
    assert df.select(epoch_ms_to_date("ms").alias("d")).collect()[0].d \
        == dt.date(2024, 2, 1)


def test_clean_numeric_and_strip(spark):
    df = spark.createDataFrame([("", " 1 2 "), ("3.5", "x")], "q string, s string")
    rows = df.select(clean_numeric("q").alias("q"),
                     strip_spaces("s").alias("s")).collect()
    assert rows[0].q is None and rows[0].s == "12"
    assert rows[1].q == 3.5 and rows[1].s == "x"


def test_union_by_name_aligns_and_fills(spark):
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([("y", 2, 9.0)], "name string, id int, extra double")
    out = union_by_name(a, b)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].extra is None and rows[2].extra == 9.0
    assert rows[2].name == "y"


def test_events_reader_handles_both_parquet_ts_units(spark, tmp_path):
    """The testdata generator has shipped events.ts as TIMESTAMP(NANOS)
    in some refreshes and TIMESTAMP(MICROS) in others; the reader probes
    the footer and must produce IDENTICAL timestamps for both encodings
    (a silent 1000x shift here corrupted every event-time operator once
    — this is the regression lock)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yougile_etl_pipeline_spark.sources.tables import (
        _events_ts_is_nanos,
        load_table,
    )

    base_us = [1704067207179575, 1704067432824425]       # epoch micros
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 11], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    for unit, scale in (("us", 1), ("ns", 1000)):
        d = tmp_path / unit
        d.mkdir()
        tbl = pa.table({**cols, "ts": pa.array(
            [v * scale for v in base_us], pa.timestamp(unit))})
        pq.write_table(tbl, str(d / "events.parquet"),
                       store_schema=False, coerce_timestamps=None)

    assert _events_ts_is_nanos(str(tmp_path / "ns" / "events.parquet"))
    assert not _events_ts_is_nanos(str(tmp_path / "us" / "events.parquet"))

    us_rows = {r.event_id: r.ts for r in
               load_table(spark, str(tmp_path / "us"), "events").collect()}
    ns_rows = {r.event_id: r.ts for r in
               load_table(spark, str(tmp_path / "ns"), "events").collect()}
    assert us_rows == ns_rows
    assert us_rows[1].year == 2024                       # not 1970, not 56k


def test_per_write_dynamic_partition_overwrite(spark, tmp_path):
    # stream_quarantine (streaming/snapshot.py) relies on the WRITER
    # option "partitionOverwriteMode=dynamic" taking precedence over
    # the session conf, so a retried micro-batch replaces only its own
    # batch_id partition without leaking a session-wide conf change
    # (the bug class: conf.set inside foreachBatch never restored).
    # Lock the semantics: two dynamic overwrites of DIFFERENT
    # partitions must both survive while the session stays static.
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static") == "static"
    d = str(tmp_path / "mart")
    for x, p in ((1, "a"), (2, "b")):
        (spark.createDataFrame([(x, p)], ["x", "p"])
              .write.mode("overwrite").partitionBy("p")
              .option("partitionOverwriteMode", "dynamic").parquet(d))
    assert sorted((r.x, r.p) for r in spark.read.parquet(d).collect()) \
        == [(1, "a"), (2, "b")]
    # and a re-write of one partition REPLACES it, leaving the other
    (spark.createDataFrame([(9, "a")], ["x", "p"])
          .write.mode("overwrite").partitionBy("p")
          .option("partitionOverwriteMode", "dynamic").parquet(d))
    assert sorted((r.x, r.p) for r in spark.read.parquet(d).collect()) \
        == [(2, "b"), (9, "a")]
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static") == "static"
