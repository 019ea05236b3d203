"""quality.py::chi2_independence_cells + text.py::kwic_concordance —
hand-checked small cases (the registry entries pin sf parity against
the DuckDB oracle; these pin the semantics)."""

from __future__ import annotations

from yougile_etl_pipeline_spark.operators.quality import (
    chi2_independence_cells,
)
from yougile_etl_pipeline_spark.operators.text import kwic_concordance


def test_chi2_cells_hand_checked(spark):
    # 2x2 table: a1/b1=2, a1/b2=2, a2/b1=2, a2/b2=2 -> perfect
    # independence, every cell chi2 = 0
    rows = [("a1", "b1")] * 2 + [("a1", "b2")] * 2 \
        + [("a2", "b1")] * 2 + [("a2", "b2")] * 2
    df = spark.createDataFrame(rows, "x string, y string")
    out = chi2_independence_cells(df, "x", "y").collect()
    assert len(out) == 4
    for r in out:
        assert (r["o"], r["r_tot"], r["c_tot"], r["n"]) == (2, 4, 4, 8)
        assert r["cell_chi2"] == 0.0


def test_chi2_cells_skewed(spark):
    # o=3 in (a1,b1), o=1 elsewhere: n=6, r(a1)=4 r(a2)=2, c(b1)=4
    # c(b2)=2. Cell (a1,b1): (3*6-16)^2/(4*4*6) = 4/96.
    rows = ([("a1", "b1")] * 3 + [("a1", "b2")]
            + [("a2", "b1")] + [("a2", "b2")])
    df = spark.createDataFrame(rows, "x string, y string")
    got = {(r["a"], r["b"]): r for r in
           chi2_independence_cells(df, "x", "y").collect()}
    cell = got[("a1", "b1")]
    assert (cell["o"], cell["r_tot"], cell["c_tot"], cell["n"]) \
        == (3, 4, 4, 6)
    assert cell["cell_chi2"] == 4.0 / 96.0
    # (a2,b2): (1*6-4)^2/(2*2*6) = 4/24
    assert got[("a2", "b2")]["cell_chi2"] == 4.0 / 24.0


def test_kwic_edges_and_middle(spark):
    df = spark.createDataFrame(
        [(1, "spark runs fast"),          # keyword at doc start
         (2, "i love spark"),             # keyword at doc end
         (3, "a b spark c d e"),          # full window both sides
         (4, "spark"),                    # lone token
         (5, "spark x spark"),            # two occurrences
         (6, "no keyword here")],         # no match
        "doc_id long, text string")
    got = {(r["doc_id"], r["pos"]): (r["left_ctx"], r["right_ctx"])
           for r in kwic_concordance(df, "doc_id", "text",
                                     "spark").collect()}
    assert got == {
        (1, 0): ("", "runs fast"),
        (2, 2): ("i love", ""),
        (3, 2): ("a b", "c d"),
        (4, 0): ("", ""),
        (5, 0): ("", "x spark"),
        (5, 2): ("spark x", ""),
    }


def test_kwic_is_map_only(spark):
    df = spark.createDataFrame([(1, "a spark b")],
                               "doc_id long, text string")
    out = kwic_concordance(df, "doc_id", "text", "spark")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: scan-project only


def test_cramers_v_hand_checked(spark):
    # the skewed 2x2 from the cell test: chi2 = 0.375 exactly; ppm
    # floors 41666+83333+83333+166666 = 374998; dof = 6*min(1,1);
    # V ~ sqrt(0.375/6) = 0.25 (quantization <= 4 ppm of chi2)
    from yougile_etl_pipeline_spark.operators.quality import (
        cramers_v_ppm,
    )

    rows = ([("a1", "b1")] * 3 + [("a1", "b2")]
            + [("a2", "b1")] + [("a2", "b2")])
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v_ppm(df, "x", "y").collect()[0]
    assert (r["n"], r["r_cats"], r["c_cats"]) == (6, 2, 2)
    assert r["chi2_ppm"] == 374998
    assert abs(r["cramers_v"] - 0.25) < 1e-4

    # degenerate: one category on one side -> V NULL
    one = spark.createDataFrame(
        [("a", "b1"), ("a", "b2")], "x string, y string")
    r = cramers_v_ppm(one, "x", "y").collect()[0]
    assert r["cramers_v"] is None
