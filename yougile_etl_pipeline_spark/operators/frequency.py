"""Frequent-item (heavy-hitter) detection at scale.

The naive plan — ``groupBy(key).count()`` then filter — shuffles every
distinct key. At 100 TB with a high-cardinality key (URLs, doc ids,
n-grams) that shuffle IS the job. The scale-right shape is the classic
two-pass Misra-Gries refinement:

  pass 1  per-partition Misra-Gries summaries (``mapInPandas``, bounded
          ``k`` counters per partition, Arrow-batched) -> tiny candidate
          set. Pigeonhole guarantee: any key with global count > N/k
          exceeds N_p/k in at least one partition, so the union of
          per-partition survivors is a SUPERSET of the true heavy
          hitters. Shuffle carries <= k rows per partition, not one row
          per distinct key.
  pass 2  broadcast the candidate set, semi-join the fact, exact
          ``groupBy().count()`` over candidate rows only, keep
          ``count * k > N`` (strict, integer arithmetic — no float
          threshold ambiguity).

The OUTPUT is exact (recounted), so it is fully oracle-pairable with
plain ``GROUP BY ... HAVING count(*)*k > N`` SQL even though the
intermediate sketch is approximate. On low-skew data the candidate set
degrades toward ``k × n_partitions`` keys — still bounded, and pass 2
stays correct, just less pruned.

Reference parity note: the reference (dags/yougile_etl_dag.py) has no
frequency analysis at all; this is north-star extension surface
(SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _misra_gries_partition(batches: Iterator[pd.DataFrame], key: str,
                           k: int) -> Iterator[pd.DataFrame]:
    """One Misra-Gries summary per partition (state spans Arrow batches).

    Keeps at most ``k`` counters. Decrement step is the textbook one:
    when a new key arrives and the table is full, decrement every
    counter and evict zeros. Counter values underestimate true counts by
    at most N_p/k, so every key with partition count > N_p/k survives.
    """
    counters: dict = {}
    for batch in batches:
        for val, cnt in batch[key].value_counts(dropna=False).items():
            # Normalize missing values to None: distinct NaN objects from
            # different Arrow batches are not dict-equal, which would
            # split the null key's counter and break accumulation.
            if pd.isna(val):
                val = None
            cnt = int(cnt)
            if val in counters:
                counters[val] += cnt
            elif len(counters) < k:
                counters[val] = cnt
            else:
                # Batched decrement: remove min(cnt, smallest survivor
                # budget) from everyone. Repeating single decrements cnt
                # times is O(cnt*k); decrementing by `dec` at once is the
                # standard batched MG step and preserves the guarantee.
                dec = min(cnt, min(counters.values()))
                counters = {v: c - dec for v, c in counters.items()
                            if c - dec > 0}
                if cnt - dec > 0 and len(counters) < k:
                    counters[val] = cnt - dec
    yield pd.DataFrame({key: list(counters.keys())})


def heavy_hitters(df: DataFrame, key: str, k: int) -> DataFrame:
    """Exact keys with ``count(*) * k > N`` via Misra-Gries prefilter.

    Returns ``(key, cnt)`` with exact counts. Two jobs: the candidate
    sweep (+ the N count, same scan cached by the parquet reader) and
    the recount. The recount's shuffle carries only rows whose key is a
    candidate — at high skew that is a vanishing fraction of the fact.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    total = df.count()
    key_df = df.select(key)
    candidates = key_df.mapInPandas(
        lambda it: _misra_gries_partition(it, key, k),
        schema=key_df.schema).distinct()
    # Null-safe semi join (<=>): GROUP BY treats NULL as a group, so a
    # null key frequent enough IS a heavy hitter — a plain equi-join
    # would silently drop it and diverge from the SQL semantics.
    cond = df[key].eqNullSafe(candidates[key])
    return (df.join(F.broadcast(candidates), cond, "left_semi")
              .groupBy(key).count().withColumnRenamed("count", "cnt")
              .filter(F.col("cnt") * k > total))
