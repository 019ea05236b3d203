"""Distributed linear algebra over embedding columns — the PCA /
whitening preprocessing step of embedding pipelines (compression,
decorrelation before clustering — e.g. ahead of `semantic_dedup`).

The split follows the repo's scale rule: the DISTRIBUTED part (one
corpus scan accumulating the d×d Gram/second-moment matrix) is exact,
partition-order-free, and DuckDB-oracle-pairable; the TINY part (the
d×d eigensolve) is a bounded driver computation on d² values — the
same driver-artifact economics as the k-means centroid list and the
BPE merge table.

Exactness trick: float sums are order-dependent, so each row's
contribution floor-quantizes to integer units FIRST
(``floor(x_i·x_j·scale)`` per row, int64), and only those integers are
summed — associative/commutative, so any partitioning and any engine
agree bit-for-bit (the `pagerank_fixed_point` / DECIMAL-ADC family of
tricks). With unit-scale embeddings and the default scale 10⁹ the
per-row term fits int64 up to |x_i·x_j| ≈ 9·10⁹, and 10⁹-row corpora
stay under int64 in the sum for |x| ≤ 3 — document your bounds when
embeddings aren't normalized.

Staged for round-6 registry certification (`emb_gram_matrix`); the
DuckDB oracle is proven in tests/test_linalg.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gram_matrix", "top_component"]

_GRAM_SCHEMA = "i int, j int, g_units long"


def gram_matrix(df: DataFrame, vec_col: str = "embedding", *,
                scale: int = 10**9) -> DataFrame:
    """Upper-triangle Gram (second-moment) matrix of the embedding
    column: ``(i, j, g_units)`` for i ≤ j, where

        g_units(i, j) = Σ_rows floor(x_i · x_j · scale)   (exact int64)

    One corpus scan: per partition an Arrow-batched numpy accumulation
    (einsum outer products, floored per ROW before summing — the
    order-independence contract above) emits at most d(d+1)/2 rows,
    then one bounded groupBy((i, j)) folds the per-partition partials.
    Shuffle volume is O(d² · partitions), independent of corpus size —
    the mergeable-state shape (`count_min_build`, `merge_aggregates`).

    Callers recover floats as ``g_units / scale`` (mean-center with the
    column means for covariance). NULL/absent vectors are skipped;
    ragged dimensions raise inside numpy (stack) — conform first."""
    vecs = df.select(vec_col).filter(F.col(vec_col).isNotNull())

    def acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        total: np.ndarray | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            # chunk rows: the (rows, d, d) outer-product tensor must be
            # materialized to floor per row, and a full 10k-row Arrow
            # batch at d=64 would allocate ~3 GB transients — 512-row
            # chunks cap it at ~17 MB with identical results (floor and
            # int64 addition are per-row/associative).
            for lo in range(0, m.shape[0], 512):
                chunk = m[lo:lo + 512]
                contrib = np.floor(
                    np.einsum("ri,rj->rij", chunk, chunk)
                    * scale).astype(np.int64)
                part = contrib.sum(axis=0)
                total = part if total is None else total + part
        if total is not None:
            iu, ju = np.triu_indices(total.shape[0])
            yield pd.DataFrame({
                "i": iu.astype(np.int32),
                "j": ju.astype(np.int32),
                "g_units": total[iu, ju],
            })

    partials = vecs.mapInPandas(acc, schema=_GRAM_SCHEMA)
    return (partials.groupBy("i", "j")
                    .agg(F.sum("g_units").alias("g_units")))


def top_component(gram: DataFrame, dim: int, *, iters: int = 50,
                  scale: int = 10**9) -> np.ndarray:
    """Leading eigenvector of the Gram matrix via driver-side power
    iteration — a bounded d² collect (the driver-artifact rule: 64-dim
    → 2080 rows; even 4096-dim → 8.4M, still driver-trivial), NOT a
    distributed op, and float: property-tested (alignment with a
    reference eigensolve), not bit-certified.

    Deterministic start (the all-ones direction) and a fixed iteration
    count keep repeated runs identical on one machine; use the output
    for projection/whitening, not as a cross-engine fingerprint."""
    rows = gram.collect()
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        v = r["g_units"] / scale
        g[r["i"], r["j"]] = v
        g[r["j"], r["i"]] = v
    vec = np.ones(dim) / np.sqrt(dim)
    for _ in range(iters):
        nxt = g @ vec
        norm = np.linalg.norm(nxt)
        if norm == 0.0:
            return vec
        vec = nxt / norm
    return vec
