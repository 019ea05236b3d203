"""Z-order layout tests: Morton bit-exactness vs a python reference,
clustering locality (tight per-bucket bounding boxes), and footer-stat
pruning on a z-clustered write."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.layout import (
    write_zordered,
    z_value,
    zorder_profile,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select("x", "y",
                    z_value(F.col("x"), F.col("y"), bits=6).alias("z"))
    for r in out.collect():
        assert r.z == _morton_ref(r.x, r.y, 6)


def test_zorder_buckets_are_tight_boxes(spark):
    """On a uniform 2-D grid, the top-6-bit z-buckets tile the space:
    the per-bucket bounding boxes must sum to ~the global area (random
    bucketing would give ~64x the global area) and each box must be a
    small fraction of the space."""
    rows = [(x, y) for x in range(128) for y in range(128)]
    df = spark.createDataFrame(rows, "x long, y long")
    prof = zorder_profile(df, "x", "y", bits=10, bucket_bits=6).collect()
    assert len(prof) == 64
    global_area = 127 * 127
    areas = [(r.x_hi - r.x_lo + 1) * (r.y_hi - r.y_lo + 1) for r in prof]
    assert sum(areas) <= 1.5 * global_area
    assert max(areas) <= global_area / 16


def test_write_zordered_prunes_both_dimensions(spark):
    """Every output file of a z-clustered write must cover a small x AND
    y range, so a predicate on either column can skip most files (the
    footer-stats pruning z-ordering exists for)."""
    li = load_table(spark, SF_SMOKE, "lineitem") \
        .select("l_partkey", "l_suppkey", "l_quantity")
    with tempfile.TemporaryDirectory(prefix="zw_") as d:
        path = os.path.join(d, "z")
        write_zordered(li, path, "l_partkey", "l_suppkey", n_files=8)
        back = spark.read.parquet(path)
        assert back.count() == li.count()
        assert set(back.columns) == set(li.columns)  # zval dropped

        import pyarrow.parquet as pq
        x_spans, y_spans = [], []
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        assert len(files) >= 4
        for f in files:
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            cols = {md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.row_group(0).num_columns)}
            lo_x = min(md.row_group(g).column(cols["l_partkey"])
                       .statistics.min for g in range(md.num_row_groups))
            hi_x = max(md.row_group(g).column(cols["l_partkey"])
                       .statistics.max for g in range(md.num_row_groups))
            lo_y = min(md.row_group(g).column(cols["l_suppkey"])
                       .statistics.min for g in range(md.num_row_groups))
            hi_y = max(md.row_group(g).column(cols["l_suppkey"])
                       .statistics.max for g in range(md.num_row_groups))
            x_spans.append(hi_x - lo_x)
            y_spans.append(hi_y - lo_y)
        gx = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
        gy = li.agg(F.max("l_suppkey") - F.min("l_suppkey")).first()[0]
        # average file span must be well under the global span in BOTH
        # dimensions — single-column sorting would leave one of these
        # at ~the full span for every file (ratio ~1.0); 8 z-ranges cut
        # the wider dimension roughly in half (measured 0.56 at sf0.001)
        assert sum(x_spans) / len(x_spans) <= 0.7 * gx
        assert sum(y_spans) / len(y_spans) <= 0.7 * gy


def test_bucketed_join_has_zero_exchange(spark):
    from tests.test_plan_audits import _formatted
    from yougile_etl_pipeline_spark.operators.layout import write_bucketed
    from yougile_etl_pipeline_spark.sources.tables import load_table

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity")
    write_bucketed(o, "b_orders", ["o_orderkey"], 4)
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "b_lineitem", ["o_orderkey"], 4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(spark.table("b_lineitem"),
                                         "o_orderkey")
        plan = _formatted(spark, j)
        body = plan.split("\n\n")[0]
        # co-located: both sides' bucketing satisfies the join's required
        # distribution — the shuffle was paid once at write time
        assert "Exchange" not in body
        assert "SortMergeJoin" in plan
        # results identical to the unbucketed join
        assert j.count() == o.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
