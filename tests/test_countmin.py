"""Count-Min sketch family (operators/frequency.py): guarantees the
round-6 registry entry will lean on — overestimate-only, EXACT merge
(counter-wise integer addition equals one-shot build), bounded state,
and bit-identical DuckDB reproduction of build + estimate (the staged
`sketch_countmin_suppliers` oracle, proven BEFORE registration like the
PQ family in test_pq_oracle_parity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.frequency import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)

W, D = 256, 4


def _lineitem(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")


def test_estimate_never_underestimates(spark):
    li = _lineitem(spark)
    sk = count_min_build(li, "l_suppkey", width=W, depth=D)
    est = count_min_estimate(sk, li.select("l_suppkey"), "l_suppkey",
                             width=W, depth=D)
    exact = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    joined = est.join(exact, "l_suppkey").collect()
    assert joined, "no keys compared"
    assert all(r["cm_est"] >= r["cnt"] for r in joined)
    # sanity on the error scale: total excess is bounded by depth
    # collisions; with 100 suppliers in 256 buckets most estimates are
    # exact — require at least half (a deterministic fact of this
    # fixture+hash, not a probabilistic assertion)
    assert sum(r["cm_est"] == r["cnt"] for r in joined) >= len(joined) / 2


def test_sketch_state_is_bounded(spark):
    li = _lineitem(spark)
    sk = count_min_build(li, "l_suppkey", width=W, depth=D)
    assert sk.count() <= W * D


def test_merge_equals_one_shot_build(spark):
    li = _lineitem(spark)
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 != 0)
    merged = count_min_merge(count_min_build(a, "l_suppkey", width=W, depth=D),
                             count_min_build(b, "l_suppkey", width=W, depth=D))
    full = count_min_build(li, "l_suppkey", width=W, depth=D)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, full.collect())))


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "k string")
    sk = count_min_build(df, "k", width=16, depth=2)
    # 3 non-null rows counted; per depth-row the counters sum to 3
    per_row = {r["depth"]: r["cnt"]
               for r in sk.groupBy("depth").agg(
                   F.sum("cnt").alias("cnt")).collect()}
    assert per_row == {0: 3, 1: 3}
    est = count_min_estimate(sk, df, "k", width=16, depth=2)
    keys = {r["k"] for r in est.collect()}
    assert keys == {"a", "b"}


def test_unseen_key_estimates_from_zero(spark):
    df = spark.createDataFrame([("a",)] * 5, "k string")
    sk = count_min_build(df, "k", width=64, depth=4)
    probe = spark.createDataFrame([("zzz",)], "k string")
    [row] = count_min_estimate(sk, probe, "k", width=64, depth=4).collect()
    # 1 key in 64 buckets x 4 rows: at least one empty bucket -> 0
    assert row["cm_est"] == 0


def test_invalid_params_raise(spark):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        count_min_build(df, "k", width=1, depth=4)
    with pytest.raises(ValueError):
        count_min_build(df, "k", width=8, depth=0)


# The staged round-6 oracle, proven bit-identical before registration.
_CM_HASH = ("CAST(('0x' || substr(md5(d || ':' || CAST(l_suppkey AS VARCHAR)),"
            " 1, 15)) AS BIGINT) % {w}")

_ORACLE = f"""
WITH ds AS (SELECT unnest(range(0, {D})) AS d),
b AS (
  SELECT d AS depth, {_CM_HASH.format(w=W)} AS bucket
  FROM lineitem, ds
  WHERE l_suppkey IS NOT NULL),
sketch AS (SELECT depth, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
ks AS (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_suppkey IS NOT NULL),
probes AS (
  SELECT l_suppkey, d AS depth, {_CM_HASH.format(w=W)} AS bucket
  FROM ks, ds)
SELECT p.l_suppkey, MIN(COALESCE(s.cnt, 0)) AS cm_est
FROM probes p LEFT JOIN sketch s USING (depth, bucket)
GROUP BY 1
"""


def test_countmin_duckdb_parity(spark):
    li = _lineitem(spark)
    sk = count_min_build(li, "l_suppkey", width=W, depth=D)
    est = count_min_estimate(sk, li.select("l_suppkey"), "l_suppkey",
                             width=W, depth=D)
    con = duck_connect(SF_SMOKE)
    assert compare(est, con, _ORACLE) == []
