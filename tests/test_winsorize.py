"""winsorize_by_group (operators/quality.py): clipping semantics,
flag correctness, validation, and the staged round-6
`quality_winsorize` DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import (
    winsorize_by_group,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _df(spark, vals):
    return spark.createDataFrame(
        [("g", float(v)) for v in vals], "k string, v double")


def test_tails_clip_to_exact_quantiles(spark):
    # 1..100: p5 -> rank 5 -> 5; p95 -> rank 95 -> 95
    d = _df(spark, range(1, 101))
    rows = winsorize_by_group(d, "k", "v").collect()
    lo = min(r.winsorized for r in rows)
    hi = max(r.winsorized for r in rows)
    assert (lo, hi) == (5.0, 95.0)
    clipped = [r for r in rows if r.was_clipped]
    assert len(clipped) == 4 + 5  # 1-4 below p5; 96-100 above p95


def test_interior_rows_untouched(spark):
    d = _df(spark, range(1, 101))
    rows = winsorize_by_group(d, "k", "v").collect()
    for r in rows:
        if 5.0 <= r.v <= 95.0:
            assert r.winsorized == r.v and not r.was_clipped


def test_null_passthrough(spark):
    d = spark.createDataFrame([("g", 1.0), ("g", 2.0), ("g", None)],
                              "k string, v double")
    rows = {r.v: r for r in winsorize_by_group(d, "k", "v").collect()}
    assert rows[None].winsorized is None
    assert rows[None].was_clipped is False


def test_invalid_band_raises(spark):
    d = _df(spark, [1])
    with pytest.raises(ValueError):
        winsorize_by_group(d, "k", "v", lo_ppm=900_000, hi_ppm=100_000)
    with pytest.raises(ValueError):
        winsorize_by_group(d, "k", "v", lo_ppm=0)


_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(row_number() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_extendedprice) AS BIGINT)
           AS rn,
         CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
           AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
cuts AS (
  SELECT l_returnflag,
         MIN(CASE WHEN rn = (n * 50000 + 999999) // 1000000
                  THEN v END) AS q_lo,
         MIN(CASE WHEN rn = (n * 950000 + 999999) // 1000000
                  THEN v END) AS q_hi
  FROM ranked GROUP BY 1)
SELECT li.l_orderkey, li.l_linenumber, li.l_returnflag,
       li.l_extendedprice, c.q_lo, c.q_hi,
       CASE WHEN li.l_extendedprice IS NOT NULL
            THEN greatest(c.q_lo, least(c.q_hi, li.l_extendedprice))
       END AS winsorized,
       li.l_extendedprice IS NOT NULL
         AND greatest(c.q_lo, least(c.q_hi, li.l_extendedprice))
             <> li.l_extendedprice AS was_clipped
FROM lineitem li
LEFT JOIN cuts c USING (l_returnflag)
"""


def test_winsorize_duckdb_parity(spark):
    li = load_table(spark, SF_SMOKE, "lineitem") \
        .select("l_orderkey", "l_linenumber", "l_returnflag",
                "l_extendedprice")
    got = winsorize_by_group(li, "l_returnflag", "l_extendedprice")
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    assert got.filter("was_clipped").count() > 0
