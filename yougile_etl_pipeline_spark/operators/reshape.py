"""Reshape operators (SURVEY.md §2.5): explode / unnest with pandas parity.

The one landmine: pandas ``df.explode(col)`` KEEPS a row (with NaN) for an
empty or NaN list (``dags/yougile_etl_dag.py:222``) — Spark's ``explode``
drops it. Everything here uses the ``_outer`` variants so parent rows
survive, matching the reference (tasks without subtasks must reach the
mart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["explode_keep_empty", "explode_structs", "posexplode_keep_empty"]


def explode_keep_empty(df: DataFrame, array_col: str, out_col: str) -> DataFrame:
    """R2 — one output row per element; empty/NULL arrays keep one row with
    NULL (pandas ``explode`` parity, ``dags/yougile_etl_dag.py:222``)."""
    other = [c for c in df.columns if c != array_col]
    return df.select(*other, F.explode_outer(array_col).alias(out_col))


def posexplode_keep_empty(df: DataFrame, array_col: str,
                          pos_col: str, out_col: str) -> DataFrame:
    """R2 with element ordinal (0-based) — needed when element position is
    meaningful (e.g. embedding dimensions, token order)."""
    other = [c for c in df.columns if c != array_col]
    return df.select(
        *other, F.posexplode_outer(array_col).alias(pos_col, out_col)
    )


def explode_structs(df: DataFrame, array_col: str, out_col: str,
                    fields: dict[str, str]) -> DataFrame:
    """R1+R3 — explode an array<struct> and extract fields natively.

    Port of ``explode('states')`` + the two dict-``get`` lambdas
    (``dags/yougile_etl_dag.py:153,156-157``): native struct access replaces
    the only user-defined code in the reference — zero UDFs. `fields` maps
    struct field → output column name."""
    other = [c for c in df.columns if c != array_col]
    exploded = df.select(*other, F.explode_outer(array_col).alias(out_col))
    extracted = [F.col(f"{out_col}.{src}").alias(dst)
                 for src, dst in fields.items()]
    return exploded.select(*other, *extracted)
