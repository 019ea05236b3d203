"""copurchase_lift (operators/frequency.py): pair/ support semantics,
basket-cap contract, and the staged round-6 `freq_copurchase_lift`
DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.frequency import (
    copurchase_lift,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def test_pair_counts_and_lift(spark):
    # items x,y together in 2 of 4 baskets; each alone in one more:
    # c_ab=2, c_x=3, c_y=3, N=4 -> lift = 2*4/(3*3) = 8/9
    d = _baskets(spark, [(1, "x"), (1, "y"), (2, "x"), (2, "y"),
                         (3, "x"), (4, "y")])
    rows = copurchase_lift(d, "basket", "item",
                           min_pair_count=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.item_a, r.item_b, r.c_ab, r.c_a, r.c_b) == \
        ("x", "y", 2, 3, 3)
    assert r.lift == 2.0 * 4.0 / 9.0


def test_duplicate_rows_in_basket_count_once(spark):
    d = _baskets(spark, [(1, "x"), (1, "x"), (1, "y"), (2, "x"),
                         (2, "y")])
    r = copurchase_lift(d, "basket", "item",
                        min_pair_count=1).collect()[0]
    assert r.c_ab == 2 and r.c_a == 2


def test_min_support_filters(spark):
    d = _baskets(spark, [(1, "x"), (1, "y"), (2, "p"), (2, "q")])
    out = copurchase_lift(d, "basket", "item", min_pair_count=2)
    assert out.count() == 0


def test_canonical_orientation(spark):
    d = _baskets(spark, [(1, "b"), (1, "a"), (2, "a"), (2, "b")])
    r = copurchase_lift(d, "basket", "item",
                        min_pair_count=1).collect()[0]
    assert r.item_a < r.item_b


def test_basket_cap_enforced_at_execution(spark):
    # the cap guard is LAZY (in-plan assert_true): building the frame
    # is free, the violation raises when an action runs it
    d = _baskets(spark, [(1, f"i{k}") for k in range(30)])
    df = copurchase_lift(d, "basket", "item", max_basket_items=10,
                         min_pair_count=1)
    with pytest.raises(Exception, match="max_basket_items"):
        df.count()


_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, count(*) AS c_ab
  FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2
  HAVING count(*) >= 2),
support AS (SELECT i, count(*) AS c FROM items GROUP BY 1),
totals AS (SELECT count(DISTINCT b) AS n_baskets FROM items)
SELECT p.item_a, p.item_b, p.c_ab,
       sa.c AS c_a, sb.c AS c_b, t.n_baskets,
       CAST(p.c_ab AS DOUBLE) * CAST(t.n_baskets AS DOUBLE)
         / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)) AS lift
FROM pairs p
JOIN support sa ON sa.i = p.item_a
JOIN support sb ON sb.i = p.item_b
CROSS JOIN totals t
"""


def test_copurchase_duckdb_parity(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = copurchase_lift(li, "l_orderkey", "l_partkey",
                          min_pair_count=2)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0, "no repeated part pairs — weak fixture"


# ---------------------------------------------------------------------------
# association_rules (round 11): directional confidence over the pairs
# ---------------------------------------------------------------------------

def test_association_rules_hand_checked(spark):
    from yougile_etl_pipeline_spark.operators.frequency import (
        association_rules,
    )
    # baskets: {A,B} x3, {A} x1  → c_A=4, c_B=3, c_AB=3, N=4
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"),
            (3, "A"), (3, "B"), (4, "A")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["antecedent"], r["consequent"]): r
           for r in association_rules(df, "b", "i").collect()}
    assert set(out) == {("A", "B"), ("B", "A")}
    ab, ba = out[("A", "B")], out[("B", "A")]
    # support identical both directions: 3/4 = 750000 ppm
    assert ab["support_ppm"] == ba["support_ppm"] == 750000
    # confidence(A→B) = 3/4; confidence(B→A) = 3/3
    assert ab["confidence_ppm"] == 750000
    assert ba["confidence_ppm"] == 1000000
    # lift symmetric: 3*4/(4*3) = 1.0
    assert ab["lift"] == ba["lift"] == 1.0
    assert ab["c_ante"] == 4 and ab["c_cons"] == 3


def test_association_rules_truncating_ppm(spark):
    from yougile_etl_pipeline_spark.operators.frequency import (
        association_rules,
    )
    # c_AB=2, c_A=3, N=3: confidence 2/3 → 666666 ppm (truncated)
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["antecedent"], r["consequent"]): r
           for r in association_rules(df, "b", "i").collect()}
    assert out[("A", "B")]["confidence_ppm"] == 666666
    assert out[("A", "B")]["support_ppm"] == 666666
