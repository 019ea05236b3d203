"""Python Data Source connector (sources/rest_datasource.py).

Reference parity: S1 cursor pagination, S3 per-column partitioned scan,
S4 parameter variants, P4 conform-on-read — now as a registered Spark
format whose partitions the scheduler distributes.
"""
from __future__ import annotations

from pyspark.sql import functions as F

SCHEMA = ("id string, title string, column_id string, deleted boolean, "
          "missing_field string")


def _register(spark):
    from yougile_etl_pipeline_spark.sources.rest_datasource import (
        YougileRestDataSource,
    )
    spark.dataSource.register(YougileRestDataSource)


def test_datasource_partitions_per_column(spark):
    _register(spark)
    df = (spark.read.format("yougile_rest").schema(SCHEMA)
          .option("method", "tasks")
          .option("column_ids", "c1,c2,c3")
          .option("limit", "2")          # forces cursor-following: 3 rows
          .load())
    # one input partition per column id
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 9               # 3 non-deleted per column
    assert {r.column_id for r in rows} == {"c1", "c2", "c3"}
    # pagination followed the cursor past the first page of 2
    assert {r.id for r in rows if r.column_id == "c1"} == {
        "tasks-c1-0", "tasks-c1-1", "tasks-c1-2"}


def test_datasource_include_deleted_variant(spark):
    _register(spark)
    df = (spark.read.format("yougile_rest").schema(SCHEMA)
          .option("include_deleted", "true")
          .option("column_ids", "c1")
          .load())
    got = df.groupBy("deleted").count().collect()
    assert {(r.deleted, r["count"]) for r in got} == {(False, 3), (True, 2)}


def test_datasource_conforms_missing_fields_to_null(spark):
    _register(spark)
    df = (spark.read.format("yougile_rest").schema(SCHEMA)
          .option("column_ids", "c1").load())
    assert df.filter(F.col("missing_field").isNotNull()).count() == 0
    assert df.schema["missing_field"].dataType.typeName() == "string"


def test_datasource_requires_explicit_schema(spark):
    import pytest as _pt

    _register(spark)
    with _pt.raises(Exception, match="explicit .schema"):
        spark.read.format("yougile_rest").load().collect()


def test_datasource_composes_with_dataframe_ops(spark):
    _register(spark)
    df = (spark.read.format("yougile_rest").schema(SCHEMA)
          .option("column_ids", "c1,c2").load())
    agg = (df.filter(~F.col("deleted"))
           .groupBy("column_id").agg(F.count("*").alias("n"))
           .orderBy("column_id").collect())
    assert [(r.column_id, r.n) for r in agg] == [("c1", 3), ("c2", 3)]
