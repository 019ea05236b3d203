"""Misra-Gries heavy hitters (operators/frequency.py).

Correctness: output equals the exact GROUP BY / HAVING result on any
input (the sketch only prunes; pass 2 recounts). Scale property: the
candidate set stays bounded by k x n_partitions even when the data is a
worst case for a hot key.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.operators.frequency import (
    _misra_gries_partition,
    heavy_hitters,
)


def _exact_hh(rows: list[str], k: int) -> dict[str, int]:
    n = len(rows)
    counts: dict[str, int] = {}
    for r in rows:
        counts[r] = counts.get(r, 0) + 1
    return {v: c for v, c in counts.items() if c * k > n}


def test_heavy_hitters_matches_exact_on_skewed_data(spark):
    # 1000 rows: one key with 400, one with 150, rest spread thin.
    rows = (["hot"] * 400 + ["warm"] * 150
            + [f"cold{i}" for i in range(450)])
    df = spark.createDataFrame([(r,) for r in rows], "key string") \
        .repartition(8)
    got = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", 5).collect()}
    # threshold is strict count*5 > 1000: only "hot" (400) qualifies —
    # "warm" (150) is below 200 and must NOT appear
    assert got == _exact_hh(rows, 5) == {"hot": 400}


def test_heavy_hitters_exact_on_low_skew_data(spark):
    # No key crosses N/k: result must be empty, not "least-bad" keys.
    rows = [f"k{i % 50}" for i in range(1000)]  # every key exactly 2%
    df = spark.createDataFrame([(r,) for r in rows], "key string") \
        .repartition(4)
    assert heavy_hitters(df, "key", 20).count() == 0  # threshold 5%


def test_heavy_hitters_boundary_is_strict(spark):
    # A key at EXACTLY N/k must not qualify (count*k > N is strict).
    rows = ["edge"] * 25 + [f"c{i}" for i in range(75)]  # edge = N/4 of 100
    df = spark.createDataFrame([(r,) for r in rows], "key string")
    got = [r["key"] for r in heavy_hitters(df, "key", 4).collect()]
    assert got == []


def test_misra_gries_candidates_bounded_and_superset():
    # Partition-local sweep: <= k survivors, and any key with
    # partition count > N_p/k is among them.
    rows = ["hot"] * 60 + [f"c{i}" for i in range(40)]
    batches = iter([pd.DataFrame({"key": rows[:30]}),
                    pd.DataFrame({"key": rows[30:]})])
    out = list(_misra_gries_partition(batches, "key", 10))
    survivors = set(out[0]["key"])
    assert len(survivors) <= 10
    assert "hot" in survivors  # 60 > 100/10


def test_heavy_hitters_rejects_degenerate_k(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("key"))
    try:
        heavy_hitters(df, "key", 1)
    except ValueError:
        pass
    else:
        raise AssertionError("k=1 must raise")


def test_heavy_hitters_null_key_is_a_group(spark):
    # SQL GROUP BY semantics: a frequent-enough NULL key IS a heavy
    # hitter (null-safe semi join; a plain equi-join would drop it).
    rows = [None] * 60 + [f"c{i}" for i in range(40)]
    df = spark.createDataFrame([(r,) for r in rows], "key string") \
        .repartition(4)
    got = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", 3).collect()}
    assert got == {None: 60}


def test_heavy_hitters_randomized_equivalence(spark):
    """Seeded random corpora with varied skew: MG-prefiltered output ==
    exact GROUP BY/HAVING result on every draw (the sketch only prunes,
    never decides)."""
    import random
    rng = random.Random(20260813)
    for trial in range(5):
        n_keys = rng.choice([3, 10, 40])
        zipf = rng.choice([True, False])
        rows = []
        for i in range(n_keys):
            c = rng.randrange(1, 120) * (n_keys - i if zipf else 1)
            rows += [f"t{trial}k{i}"] * c
        rng.shuffle(rows)
        k = rng.choice([3, 5, 17])
        df = spark.createDataFrame([(r,) for r in rows], "key string") \
            .repartition(rng.choice([1, 3, 8]))
        got = {r["key"]: r["cnt"]
               for r in heavy_hitters(df, "key", k).collect()}
        assert got == _exact_hh(rows, k), (trial, k, len(rows))
