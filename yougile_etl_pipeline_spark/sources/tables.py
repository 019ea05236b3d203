"""Parquet table readers for the engine's logical tables.

Production rule (SURVEY.md §1.3): *never rely on schema inference*. The
reader passes the explicit StructType to ``spark.read.schema(...)`` — this
both documents the contract and guarantees a stable ``ReadSchema`` for
column pruning; a drifted file fails loudly at scan time instead of
silently changing downstream semantics.

At 100 TB these same entry points take directory paths of partitioned
parquet; nothing here materializes or collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from yougile_etl_pipeline_spark.schemas import TESTDATA_SCHEMAS

__all__ = ["load_table", "load_tables", "register_temp_views"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one logical table from ``{sf_dir}/{name}.parquet`` with its
    explicit schema (no inference)."""
    schema = TESTDATA_SCHEMAS.get(name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] | None = None) -> dict[str, DataFrame]:
    """Load several tables; defaults to all ten testdata tables."""
    names = names or tuple(TESTDATA_SCHEMAS)
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for `spark.sql` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
