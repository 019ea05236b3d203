"""Sources & sinks: parquet/JSONL readers, paginated REST extractor, writers."""

from yougile_etl_pipeline_spark.sources.tables import load_table, load_tables  # noqa: F401
