"""Property-based tests (hypothesis) for the late-round-5 staged
operators: semantics vs tiny Python oracles (SURVEY.md §5.4 model)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from yougile_etl_pipeline_spark.operators.quality import (
    exact_group_quantiles,
    exact_mode,
    weighted_group_median,
)
from yougile_etl_pipeline_spark.operators.timeseries import (
    cusum_fixed_point,
    rolling_slope,
)

_slow = settings(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(rows=st.lists(
    st.tuples(st.integers(-100, 100), st.integers(1, 9)),
    min_size=1, max_size=25))
@_slow
def test_weighted_median_matches_expansion(spark, rows):
    """weighted median == lower median of the weight-expanded
    multiset, for any integer weights."""
    d = spark.createDataFrame(
        [("g", float(v), w) for v, w in rows],
        "k string, v double, w long")
    got = weighted_group_median(d, "k", "v", "w").collect()[0]["wmedian"]
    expanded = sorted(v for v, w in rows for _ in range(w))
    want = expanded[math.ceil(len(expanded) / 2) - 1]
    assert got == float(want)


@given(vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
       qs=st.lists(st.integers(1, 1_000_000), min_size=1, max_size=4,
                   unique=True))
@_slow
def test_quantiles_match_type1_definition(spark, vals, qs):
    d = spark.createDataFrame([("g", float(v)) for v in vals],
                              "k string, v double")
    got = {r["q_ppm"]: r["quantile"]
           for r in exact_group_quantiles(d, "k", "v",
                                          q_ppm=qs).collect()}
    s = sorted(vals)
    n = len(s)
    for q in qs:
        rank = -((-n * q) // 1_000_000)  # ceil
        assert got[q] == float(s[max(rank, 1) - 1])


@given(vals=st.lists(st.sampled_from("abcde"), min_size=1, max_size=40))
@_slow
def test_mode_matches_counter_with_tiebreak(spark, vals):
    d = spark.createDataFrame([(1, v) for v in vals],
                              "k long, v string")
    r = exact_mode(d, "k", "v").collect()[0]
    counts = Counter(vals)
    best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
    assert (r["mode"], r["mode_count"]) == best


@given(vals=st.lists(st.integers(0, 500), min_size=1, max_size=30),
       k=st.integers(0, 100), h=st.integers(1, 300))
@_slow
def test_cusum_matches_python_simulation(spark, vals, k, h):
    d = spark.createDataFrame(
        [(1, i + 1, float(v)) for i, v in enumerate(vals)],
        "u long, e long, v double")
    out = {r.e: (r.cusum, r.is_alarm)
           for r in cusum_fixed_point(
               d, "u", ["e"], "v",
               drift=float(k), threshold=float(h)).collect()}
    s = 0
    for i, v in enumerate(vals, 1):
        raw = max(0, s + v * 100 - k * 100)
        alarm = raw > h * 100
        s = 0 if alarm else raw
        assert out[i] == (raw / 100.0, alarm)


@given(vals=st.lists(st.integers(-50, 50), min_size=2, max_size=20),
       n=st.integers(2, 8))
@_slow
def test_rolling_slope_matches_numpy_lstsq(spark, vals, n):
    import numpy as np

    d = spark.createDataFrame(
        [(1, i + 1, float(v)) for i, v in enumerate(vals)],
        "u long, e long, v double")
    out = {r.e: r.slope for r in rolling_slope(
        d, "u", ["e"], "v", window_n=n).collect()}
    for i in range(1, len(vals) + 1):
        lo = max(0, i - n)
        xs = np.arange(lo + 1, i + 1, dtype=float)
        ys = np.array(vals[lo:i], dtype=float)
        if len(xs) < 2:
            assert out[i] is None
            continue
        denom = len(xs) * (xs * xs).sum() - xs.sum() ** 2
        if denom == 0:
            assert out[i] is None
            continue
        want = (len(xs) * (xs * ys).sum() - xs.sum() * ys.sum()) / denom
        assert math.isclose(out[i], want, rel_tol=1e-12, abs_tol=1e-12)


@given(docs=st.lists(
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=12),
    min_size=1, max_size=8))
@_slow
def test_dup_span_coverage_matches_python_oracle(spark, docs):
    """covered = union of positions inside n-grams shared with at
    least one OTHER document (n=3)."""
    texts = [" ".join(toks) for toks in docs]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    from yougile_etl_pipeline_spark.operators.text import (
        dup_span_coverage,
    )

    got = {r["doc_id"]: (r["n_tokens"], r["n_covered"])
           for r in dup_span_coverage(d, n=3).collect()}

    # python oracle on the same split(' ') tokens (empty text -> [''])
    tok_lists = [t.split(" ") for t in texts]
    gram_docs: dict[tuple, set] = {}
    for i, toks in enumerate(tok_lists):
        for s_ in range(len(toks) - 2):
            gram_docs.setdefault(tuple(toks[s_:s_ + 3]), set()).add(i)
    for i, toks in enumerate(tok_lists):
        covered = set()
        for s_ in range(len(toks) - 2):
            g = tuple(toks[s_:s_ + 3])
            if len(gram_docs[g]) >= 2:
                covered |= {s_, s_ + 1, s_ + 2}
        assert got[i] == (len(toks), len(covered))


@given(docs=st.lists(
    st.lists(st.sampled_from(["x", "y", "z", "the", "a"]),
             min_size=1, max_size=10),
    min_size=1, max_size=6))
@_slow
def test_rake_scores_match_python_oracle(spark, docs):
    from yougile_etl_pipeline_spark.operators.text import (
        STOPWORDS,
        rake_keyphrases,
    )

    texts = [" ".join(toks) for toks in docs]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = {r["phrase"]: (r["n_words"], r["n_occurrences"],
                         r["score_ppm"])
           for r in rake_keyphrases(d, min_count=1).collect()}

    # python oracle
    stops = set(STOPWORDS) | {""}
    phrases = []
    for t in texts:
        run = []
        for tok in t.split(" ") + ["the"]:  # sentinel flushes the run
            if tok in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(tok)
    freq: Counter = Counter()
    deg: Counter = Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    wppm = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    want: dict = {}
    for ph in phrases:
        key = " ".join(ph)
        score = sum(wppm[w] for w in ph)
        n, occ, _ = want.get(key, (len(ph), 0, score))
        want[key] = (len(ph), occ + 1, score)
    assert got == want
