"""yougile_etl_pipeline_spark — a PySpark-native mart-building/analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference `rsaroot/yougile-etl-pipeline` (a pandas/Airflow ETL DAG; see
SURVEY.md for the full operator inventory with `dags/yougile_etl_dag.py`
file:line citations), and extends it with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Layout:
    session.py    — SparkSession factory with pinned semantics (UTC, AQE)
    schemas.py    — explicit StructTypes + the `conform` operator (P4)
    sources/      — parquet/JSONL readers, paginated REST extractor, JDBC sink
    operators/    — relational / reshape / dedup / similarity / text ops
    functions/    — scalar expression helpers (F1–F7 of SURVEY.md §2.7)
    plans/        — end-to-end pipeline compositions (the flagship mart build)
    streaming/    — Structured Streaming variant of the hourly snapshot
"""

__version__ = "0.1.0"
