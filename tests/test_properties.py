"""Property-based tests (hypothesis): operator semantics vs a pandas
micro-oracle (SURVEY.md §5.4)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from yougile_etl_pipeline_spark.operators.relational import null_safe_neq
from yougile_etl_pipeline_spark.schemas import conform

_slow = settings(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(flags=st.lists(st.sampled_from([True, False, None]), min_size=1,
                      max_size=20))
@_slow
def test_null_safe_neq_matches_pandas(spark, flags):
    """Spark `null_safe_neq(col, True)` == pandas `df[df.x != True]`
    (pandas keeps NaN/None rows — the P6 gotcha, dag.py:239)."""
    ids = list(range(len(flags)))
    sdf = spark.createDataFrame(
        list(zip(ids, flags)),
        T.StructType([T.StructField("id", T.IntegerType()),
                      T.StructField("x", T.BooleanType())]))
    spark_kept = {r.id for r in
                  sdf.filter(null_safe_neq("x", True)).collect()}
    # object dtype, not pandas' nullable BooleanDtype: the reference's
    # 'deleted' column holds NaN/None as object/float after the left merge
    # (dag.py:237-239), where `!= True` keeps missing values.
    pdf = pd.DataFrame({"id": ids, "x": pd.array(flags, dtype=object)})
    pandas_kept = set(pdf[pdf["x"] != True]["id"])  # noqa: E712
    assert spark_kept == pandas_kept


@given(present=st.sets(st.sampled_from(["a", "b", "c", "d"]), min_size=1))
@_slow
def test_conform_idempotent_and_total(spark, present):
    """conform() always yields exactly the target schema (P4), regardless
    of which columns the input happens to have, and is idempotent."""
    target = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.DoubleType()),
        T.StructField("d", T.BooleanType()),
    ])
    values = {"a": 1, "b": "x", "c": 2.5, "d": True}
    cols = sorted(present)
    sdf = spark.createDataFrame(
        [tuple(values[c] for c in cols)],
        ", ".join(f"{c} {dict(a='long', b='string', c='double', d='boolean')[c]}"
                  for c in cols))
    out = conform(sdf, target)
    assert [f.name for f in out.schema.fields] == ["a", "b", "c", "d"]
    row = out.collect()[0]
    for c in ["a", "b", "c", "d"]:
        assert getattr(row, c) == (values[c] if c in present else None)
    assert conform(out, target).schema == out.schema
