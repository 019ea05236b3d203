"""Distributed exact selection (operators/quality.py::exact_kth_value):
correctness against sorted-oracle on adversarial shapes (duplicates,
bimodal extremes, tiny collect caps forcing deep iteration) and DuckDB
ORDER BY ... OFFSET parity for the staged round-6
`agg_exact_median_global` query."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.quality import exact_kth_value

_slow = settings(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def test_forced_iterative_path_on_smoke_lineitem(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    n = li.filter("l_extendedprice IS NOT NULL").count()
    k = (n + 1) // 2
    # collect_cap far below n forces at least one histogram pass
    got = exact_kth_value(li, "l_extendedprice", k,
                          buckets=64, collect_cap=200)
    want = (li.orderBy("l_extendedprice")
              .select("l_extendedprice").collect()[k - 1][0])
    assert got == want


def test_duckdb_offset_parity(spark):
    import duckdb

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    n = li.count()
    k = (n + 1) // 2
    got = exact_kth_value(li, "l_extendedprice", k,
                          buckets=128, collect_cap=500)
    con = duckdb.connect()
    want = con.execute(
        f"SELECT l_extendedprice FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet') "
        f"WHERE l_extendedprice IS NOT NULL "
        f"ORDER BY l_extendedprice OFFSET {k - 1} LIMIT 1").fetchone()[0]
    assert got == want


def test_duplicate_run_converges(spark):
    # 50 identical values around the target rank, tiny cap: the
    # histogram can never split them — the tighten-to-true-bounds path
    # must prove min==max and return
    vals = [1.0] * 5 + [7.5] * 50 + [9.0] * 5
    got = exact_kth_value(_df(spark, vals), "x", 30,
                          buckets=4, collect_cap=3)
    assert got == 7.5


def test_bimodal_extremes_make_progress(spark):
    # two tight clusters at the range ends: early passes can't split
    # within a cluster until bounds re-tighten
    vals = [1.0 + i * 1e-9 for i in range(20)] \
        + [1e9 + i * 1e-3 for i in range(20)]
    got = exact_kth_value(_df(spark, vals), "x", 25,
                          buckets=4, collect_cap=2)
    assert got == sorted(vals)[24]


def test_out_of_range_and_nulls(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    assert exact_kth_value(df, "x", 3) is None      # only 2 non-null
    assert exact_kth_value(df, "x", 0) is None
    assert exact_kth_value(df, "x", 2) == 3.0


@given(vals=st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=50),
    k_frac=st.floats(min_value=0.0, max_value=1.0))
@_slow
def test_matches_sorted_oracle(spark, vals, k_frac):
    k = max(1, min(len(vals), int(round(k_frac * len(vals)))))
    got = exact_kth_value(_df(spark, vals), "x", k,
                          buckets=8, collect_cap=4)
    assert got == sorted(float(v) for v in vals)[k - 1]
