"""operators/relational.py::grouped_topk — the two-phase per-group
top-k (partition-local mapInPandas combiner, then a bounded
row_number stitch). Written for the corpus-release quota (VERDICT
r07 #1): the result must be BIT-IDENTICAL to the bare
``row_number() OVER (PARTITION BY g ORDER BY ...)`` form while never
funnelling a whole group through one task.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from yougile_etl_pipeline_spark.operators.relational import grouped_topk


def _window_topk(df, group_cols, order_cols, k):
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (df.withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") <= k).drop("__rk"))


def _rows(df):
    # str key: nulls make bare tuple comparison raise; any
    # deterministic total order works for the set-equality check
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_grouped_topk_matches_window_with_ties(spark):
    # Heavily tied order values + a skewed group ("en" 10x larger) +
    # k below, at, and above group size; id breaks every tie so the
    # order is total and both forms must agree exactly.
    rows = [(("en" if i % 12 else "fr"), i % 5, i) for i in range(600)]
    rows += [("de", 7, 10_000), ("de", 7, 10_001)]  # tiny group < k
    df = (spark.createDataFrame(rows, "g string, v int, id long")
          .repartition(8))
    for k in (1, 3, 50):
        got = grouped_topk(df, ["g"], ["v", "id"], k)
        want = _window_topk(df, ["g"], ["v", "id"], k)
        assert _rows(got) == _rows(want), f"k={k} diverged"


def test_grouped_topk_null_order_keys_survive(spark):
    # Spark's ascending window order is NULLS FIRST; phase 1 sorts
    # na_position='first' to match — a null order key must WIN the
    # top-k, not be silently dropped by the combiner (ADVICE r08).
    rows = [("a", None, 1), ("a", 5, 2), ("a", 1, 3),
            ("b", None, 4), ("b", None, 5), ("b", 0, 6)]
    df = (spark.createDataFrame(rows, "g string, v int, id long")
          .repartition(4))
    got = grouped_topk(df, ["g"], ["v", "id"], 2)
    want = _window_topk(df, ["g"], ["v", "id"], 2)
    assert _rows(got) == _rows(want)
    kept = {r[2] for r in got.collect()}
    assert kept == {1, 3, 4, 5}  # the nulls ranked first


def test_grouped_topk_null_group_key(spark):
    # A null GROUP is still a group (pandas groupby dropna=False /
    # Spark partitionBy agree); it must quota independently.
    rows = [(None, i, i) for i in range(10)] + [("x", 0, 100)]
    df = (spark.createDataFrame(rows, "g string, v int, id long")
          .repartition(3))
    got = grouped_topk(df, ["g"], ["v", "id"], 4)
    want = _window_topk(df, ["g"], ["v", "id"], 4)
    assert _rows(got) == _rows(want)
    assert got.count() == 5  # 4 from the null group + 1 from "x"


def test_grouped_topk_unicode_order_keys(spark):
    # pandas compares code points, Spark compares UTF-8 bytes; UTF-8
    # byte order == code-point order by construction, so non-ASCII
    # keys must round-trip identically through both phases.
    rows = [("g", s, i) for i, s in enumerate(
        ["z", "é", "ß", "日本", "a", "Ω", "", "é2", "zz", "中"])]
    df = (spark.createDataFrame(rows, "g string, v string, id long")
          .repartition(4))
    got = grouped_topk(df, ["g"], ["v", "id"], 5)
    want = _window_topk(df, ["g"], ["v", "id"], 5)
    assert _rows(got) == _rows(want)


def test_grouped_topk_plan_has_local_combiner(spark):
    # The 100x pin: the mapInPandas combiner precedes the stitch
    # window, so the window's sort input is bounded by
    # |groups|*k*partitions — never the raw table.
    df = spark.createDataFrame(
        [("a", 1, 1)], "g string, v int, id long")
    out = grouped_topk(df, ["g"], ["v", "id"], 3)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "MapInPandas" in plan
    assert "Window" in plan


def test_grouped_topk_rejects_float_order_columns(spark):
    # ADVICE r09: pandas sorts NaN as NA (first, under
    # na_position='first') while Spark's window orders NaN after all
    # numbers, and Arrow conflates NULL/NaN doubles in phase 1 — so a
    # floating-point order key could let the local combiner evict rows
    # the window phase would keep. The operator must refuse instead of
    # silently returning a wrong answer.
    import pytest

    df = spark.createDataFrame(
        [("a", 1.5, 1)], "g string, v double, id long")
    with pytest.raises(ValueError, match="floating-point"):
        grouped_topk(df, ["g"], ["v", "id"], 3)
    ff = spark.createDataFrame(
        [("a", 1.5, 1)], "g string, v float, id long")
    with pytest.raises(ValueError, match="floating-point"):
        grouped_topk(ff, ["g"], ["v", "id"], 3)
    # integer order keys stay accepted
    ok = spark.createDataFrame([("a", 1, 1)], "g string, v int, id long")
    assert grouped_topk(ok, ["g"], ["v", "id"], 3).count() == 1
