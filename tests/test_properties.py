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


@given(ts_a=st.lists(st.integers(min_value=0, max_value=400),
                     min_size=1, max_size=15),
       ts_b=st.lists(st.integers(min_value=0, max_value=400),
                     min_size=1, max_size=15))
@_slow
def test_interval_join_banded_equals_naive(spark, ts_a, ts_b):
    """The banded range-join rewrite must equal the naive inequality join
    for arbitrary timestamps — especially values landing exactly on
    bucket edges (gap=100 here, so multiples of 100 are edge cases the
    generator hits often)."""
    from yougile_etl_pipeline_spark.operators.relational import interval_join

    a = spark.createDataFrame([(1, i, t) for i, t in enumerate(ts_a)],
                              "k int, a_id int, ms long")
    b = spark.createDataFrame([(1, i, t) for i, t in enumerate(ts_b)],
                              "k int, b_id int, ms long")
    banded = {(r.a_id, r.b_id_r) for r in
              interval_join(a, b, keys=["k"], left_ts="ms", right_ts="ms",
                            max_gap_ms=100).collect()}
    naive = {(x_id, y_id)
             for _, x_id, x in [(1, i, t) for i, t in enumerate(ts_a)]
             for _, y_id, y in [(1, i, t) for i, t in enumerate(ts_b)]
             if x < y <= x + 100}
    assert banded == naive


@given(docs=st.lists(
    st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=24),
    min_size=1, max_size=6))
@_slow
def test_dedup_roundtrip_and_python_oracle(spark, docs):
    """line_dedup/self_dedup vs a per-row python micro-oracle on random
    small-vocab token streams: (a) with min_df above the corpus size,
    line_dedup is the identity; (b) self_dedup keeps exactly the
    first occurrence of each aligned segment, in order."""
    from yougile_etl_pipeline_spark.operators.text import (
        line_dedup,
        self_dedup,
    )

    W = 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")

    ident = {r.doc_id: r.clean_text
             for r in line_dedup(sdf, seg_tokens=W,
                                 min_df=len(docs) + 1).collect()}
    assert ident == dict(rows)

    def segs(toks):
        return [" ".join(toks[i:i + W]) for i in range(0, len(toks), W)]

    expect = {}
    for i, toks in enumerate(docs):
        seen, kept = set(), []
        for s in segs(toks):
            if s not in seen:
                seen.add(s)
                kept.append(s)
        expect[i] = " ".join(kept)
    got = {r.doc_id: r.clean_text
           for r in self_dedup(sdf, seg_tokens=W).collect()}
    assert got == expect


@given(keys=st.lists(st.integers(min_value=0, max_value=50),
                     min_size=1, max_size=60))
@_slow
def test_countmin_overestimates_and_merges_exactly(spark, keys):
    """CMS property: estimate >= exact count for every key, at any key
    multiset; merge(build(A), build(B)) == build(A ∪ B) exactly."""
    from collections import Counter

    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.operators.frequency import (
        count_min_build,
        count_min_estimate,
        count_min_merge,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    sk = count_min_build(df, "k", width=32, depth=3)
    est = {r["k"]: r["cm_est"] for r in
           count_min_estimate(sk, df, "k", width=32, depth=3).collect()}
    exact = Counter(keys)
    assert set(est) == set(exact)
    assert all(est[k] >= c for k, c in exact.items())
    half_a = df.filter(F.col("k") % 2 == 0)
    half_b = df.filter(F.col("k") % 2 != 0)
    merged = count_min_merge(
        count_min_build(half_a, "k", width=32, depth=3),
        count_min_build(half_b, "k", width=32, depth=3))
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, sk.collect())))


@given(texts=st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30),
    min_size=2, max_size=8))
@_slow
def test_containment_bounds_and_symmetry_relation(spark, texts):
    """Containment property: both directions in (0, 1]; common <= both
    sizes; and Jaccard <= min(containment) for every emitted pair."""
    from yougile_etl_pipeline_spark.operators.dedup import (
        shingle_containment_pairs,
    )

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    rows = shingle_containment_pairs(df, "doc_id", "text", n=2,
                                     threshold=0.0,
                                     max_shingle_df=None).collect()
    for r in rows:
        assert 0 < r["cont_a_in_b"] <= 1 and 0 < r["cont_b_in_a"] <= 1
        assert r["common"] <= min(r["sz_a"], r["sz_b"])
        jac = r["common"] / (r["sz_a"] + r["sz_b"] - r["common"])
        assert jac <= min(r["cont_a_in_b"], r["cont_b_in_a"]) + 1e-12


@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000),
                     min_size=1, max_size=40))
@_slow
def test_exact_median_matches_statistics_median(spark, vals):
    """exact_group_median == statistics.median on any int multiset."""
    import statistics

    from yougile_etl_pipeline_spark.operators.quality import (
        exact_group_median,
    )

    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "k string, v double")
    [r] = exact_group_median(df, "k", "v").collect()
    assert r["median"] == float(statistics.median(vals))


@given(words=st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1, max_size=12, unique=True))
@_slow
def test_bpe_merge_preserves_concatenation(spark, words):
    """Applying any observed merge never changes the string a symbol
    sequence spells out (merges only glue adjacent symbols)."""
    from yougile_etl_pipeline_spark.operators.bpe import (
        apply_merge,
        best_pair,
        char_symbols,
        pair_counts,
    )

    df = (spark.createDataFrame([(w,) for w in words], "word string")
          .withColumn("syms", char_symbols("word")))
    win = best_pair(pair_counts(df))
    if win is None:
        return
    out = apply_merge(df, win[0], win[1]).collect()
    for r in out:
        assert "".join(r["syms"]) == r["word"] + "</w>"
