"""Embedding scalar quantization (symmetric per-vector int8).

At 100 TB the embedding column dominates storage, scan bytes, and
shuffle width. Symmetric int8 quantization stores one byte per
dimension plus one double scale per vector — 4× smaller than float32
(8× vs the double arrays the HOF math uses) — and every downstream
operator keeps working on the dequantized values ``q · scale``.
Quantization is a map-only transform (zero shuffle); recall of search
over dequantized vectors vs full precision is property-tested
(tests/test_quantize_vocab.py).

Portability (the reason this op is oracle-pairable at all): the code
uses only IEEE ops that are bit-identical in DuckDB — division,
``floor(x + 0.5)`` half-up rounding, greatest/least clamping.
``round()`` is deliberately avoided: Spark rounds the shortest-repr
decimal string while DuckDB rounds the binary value, so their results
diverge on raw doubles. All-zero vectors (scale = 0) map to all-zero
codes instead of dividing by zero.

No reference twin (the reference has no vector ops at all —
SURVEY.md §2.10); this is part of the E2 similarity-search extension
family.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quantize_int8",
    "quantize_int8_np",
    "dequantize",
    "quantize_summary",
]


def _scale(v: Column) -> Column:
    return F.array_max(F.transform(v, F.abs)) / F.lit(127.0)


def quantize_int8(df: DataFrame, *, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, vec) → (id, vec, scale, qvec): per-vector symmetric int8.

    ``scale = max(|x|)/127``; ``q = clamp(floor(x/scale + 0.5), ±127)``.
    The max component quantizes to exactly ±127, so the clamp only
    guards float rounding at the boundary. Map-only (no shuffle); the
    per-element lambdas run interpreted, which is fine for a transform
    evaluated once per stored vector — `quantize_int8_np` is the
    Arrow-batched twin for quantizing a whole corpus."""
    v = F.col(vec_col).cast("array<double>")
    out = df.select(F.col(id_col), F.col(vec_col),
                    _scale(v).alias("scale"))
    q = F.when(F.col("scale") == 0,
               F.transform(v, lambda x: F.lit(0))) \
         .otherwise(F.transform(
             v, lambda x: F.greatest(
                 F.lit(-127.0),
                 F.least(F.lit(127.0),
                         F.floor(x / F.col("scale") + F.lit(0.5))))
             .cast("int")))
    return out.withColumn("qvec", q)


def quantize_int8_np(df: DataFrame, *, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Arrow-batched numpy twin of `quantize_int8` — one vectorized pass
    per batch instead of interpreted per-element lambdas (the same
    HOF-vs-numpy trade as the similarity scorers). Bit-identical to the
    HOF path: float32→float64 widening is exact, and numpy's divide/
    floor/clip are the same IEEE ops Catalyst evaluates."""
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    vec_type = dict(df.dtypes)[vec_col]
    out_schema = (f"{id_col} {id_type}, {vec_col} {vec_type}, "
                  f"scale double, qvec array<int>")

    def quant(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(x, dtype=np.float64)
                          for x in pdf[vec_col]])
            scale = np.abs(V).max(axis=1) / 127.0
            safe = np.where(scale == 0.0, 1.0, scale)
            Q = np.clip(np.floor(V / safe[:, None] + 0.5), -127.0, 127.0)
            Q = np.where(scale[:, None] == 0.0, 0.0, Q).astype(np.int32)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                vec_col: pdf[vec_col].to_numpy(),
                "scale": scale,
                "qvec": list(Q),
            })

    return df.select(id_col, vec_col).mapInPandas(quant, out_schema)


def dequantize(qvec: Column | str, scale: Column | str) -> Column:
    """int8 codes → array<double>: ``q · scale`` (exact int→double
    widening, one IEEE multiply — identical in the SQL oracle)."""
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    s = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(q, lambda x: x.cast("double") * s)


def quantize_summary(df: DataFrame, *, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Per-vector quantization report: (id, scale, max_abs_err,
    within_half_step). ``max_abs_err`` is the reconstruction error
    ``max |x − q·scale|``; half-up rounding bounds it by ``scale/2``
    (up to float rounding at the boundary, hence the boolean is a
    *computed* claim, not an assumption — the oracle recomputes the
    identical IEEE comparison)."""
    qz = quantize_int8(df, id_col=id_col, vec_col=vec_col)
    v = F.col(vec_col).cast("array<double>")
    err = F.array_max(F.zip_with(
        v, dequantize("qvec", "scale"), lambda a, b: F.abs(a - b)))
    return qz.select(
        F.col(id_col), F.col("scale"),
        err.alias("max_abs_err"),
        (err <= F.col("scale") * F.lit(0.5)).alias("within_half_step"))
