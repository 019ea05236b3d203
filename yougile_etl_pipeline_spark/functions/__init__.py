"""Scalar expression helpers (SURVEY.md §2.7 F1–F7) — all pure Catalyst."""

from yougile_etl_pipeline_spark.functions.scalar import (  # noqa: F401
    clean_numeric,
    coalesce_cols,
    epoch_ms_to_date,
    parse_ddmmyyyy,
    split_range,
    strip_spaces,
)
