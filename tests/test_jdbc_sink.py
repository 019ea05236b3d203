"""Live JDBC sink test (SURVEY.md §2.1 S5) against embedded Derby.

The reference's actual sink is ``PostgresHook.insert_rows`` into
``tops_yg.cdm_tasks`` (``/root/reference/dags/yougile_etl_dag.py:325-333,367``).
No Postgres exists in this environment, but Spark bundles the Derby
embedded JDBC driver (used for the Hive metastore), so the write path —
DataFrameWriter.jdbc through a real java.sql connection, type mapping,
append semantics, connection fan-in via coalesce — executes for real here.
"""
from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.sources.sinks import append_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url():
    d = tempfile.mkdtemp(prefix="derby_")
    return f"jdbc:derby:{d}/db;create=true"


def _props():
    return {"driver": DRIVER}


def _tasks(spark, lo, hi, title_prefix="task-"):
    return spark.range(lo, hi).select(
        F.col("id").cast("long").alias("task_id"),
        F.concat(F.lit(title_prefix), F.col("id")).alias("title"),
        (F.col("id") * 2.5).alias("score"),
    )


def test_jdbc_append_roundtrip(spark, derby_url):
    df = _tasks(spark, 0, 50)
    append_jdbc(df, derby_url, "t_roundtrip", _props(), num_partitions=2)

    back = spark.read.jdbc(derby_url, "t_roundtrip", properties=_props())
    assert back.count() == 50
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in df.collect()}
    assert got == want


def test_jdbc_append_accumulates(spark, derby_url):
    """mode=append must add rows, not replace (the reference appends the
    hourly snapshot every run)."""
    append_jdbc(_tasks(spark, 0, 10, "run1-"), derby_url, "t_acc", _props())
    append_jdbc(_tasks(spark, 10, 20, "run2-"), derby_url, "t_acc", _props())
    back = spark.read.jdbc(derby_url, "t_acc", properties=_props())
    assert back.count() == 20
    assert back.filter(F.col("title").startswith("run2-")).count() == 10


def test_jdbc_null_handling(spark, derby_url):
    """S6: NaN→NULL is native in Spark — a None in the DataFrame lands as
    SQL NULL through the JDBC writer (the reference needed an explicit
    ``df.replace({np.nan: None})``, dag.py:329)."""
    df = spark.createDataFrame(
        [(100, None, None)], "task_id long, title string, score double")
    append_jdbc(df, derby_url, "t_nulls", _props())
    row = (spark.read.jdbc(derby_url, "t_nulls", properties=_props())
           .collect()[0])
    assert row.title is None and row.score is None


def test_write_sorted_mart_layout(spark, tmp_path):
    """Range-partitioned sorted write: files hold disjoint, internally
    sorted key ranges (tight row-group min/max stats = pruning at scale)."""
    import pyspark.sql.functions as F

    from yougile_etl_pipeline_spark.sources.sinks import write_sorted_mart

    df = spark.range(0, 10000).select(
        (F.col("id") * 2654435761 % 10000).alias("k"),
        F.col("id").alias("payload"))
    path = str(tmp_path / "sorted_mart")
    write_sorted_mart(df, path, range_col="k", sort_cols=["payload"],
                      num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 10000
    # per-file: sorted within, ranges disjoint across files
    withf = back.withColumn("f", F.input_file_name())
    stats = (withf.groupBy("f")
             .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
             .collect())
    spans = sorted([(r.lo, r.hi) for r in stats])
    assert len(spans) == 4
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2, "file key ranges overlap"
