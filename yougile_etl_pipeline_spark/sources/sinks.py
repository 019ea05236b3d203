"""Sinks: parquet mart writer + JDBC append (SURVEY.md §2.1 S5/S6) + alerts (S7).

The reference appends the mart via ``PostgresHook.insert_rows`` after a
``df.replace({np.nan: None})`` (``dags/yougile_etl_dag.py:325-333``). In
Spark, NULL is native (S6 is a no-op) and the append is a single
``df.write.jdbc`` — executed in parallel from executors, not a driver-side
row loop.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = ["write_parquet_mart", "write_sorted_mart", "append_jdbc",
           "AlertSink"]


def write_parquet_mart(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "append",
) -> None:
    """Write the mart as parquet, optionally partitioned (e.g. by the
    ``loaded_ts``-derived load date — the reference's hourly snapshot key,
    ``dags/yougile_etl_dag.py:280``). Partitioning by load date keeps every
    incremental append a new directory: no rewrite, prunable time travel.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_sorted_mart(df: DataFrame, path: str, *, range_col: str,
                      sort_cols: list[str] | None = None,
                      num_files: int | None = None,
                      mode: str = "overwrite") -> None:
    """Range-partitioned, sorted parquet layout — the standard big-table
    layout for scan-heavy marts: `repartitionByRange(range_col)` gives
    globally ordered, size-balanced files; `sortWithinPartitions` (the
    range col + optional secondaries) makes every parquet row-group's
    min/max statistics tight, so point/range predicates on `range_col`
    skip whole files AND whole row groups at 100 TB. The sort is a
    one-time write cost; every subsequent scan benefits."""
    parts = [range_col, *(sort_cols or [])]
    out = df.repartitionByRange(*([num_files] if num_files else []),
                                range_col)
    out.sortWithinPartitions(*parts).write.mode(mode).parquet(path)


def append_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    *,
    num_partitions: int | None = None,
) -> None:
    """Append to an RDBMS table (reference sink ``tops_yg.cdm_tasks``,
    ``dags/yougile_etl_dag.py:367``). ``num_partitions`` caps concurrent
    connections — at scale, coalesce so the DB isn't hammered by one
    connection per shuffle partition."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    df.write.jdbc(url=url, table=table, mode="append", properties=properties)


class AlertSink:
    """Driver-side alert hook (reference: Telegram bot POST,
    ``dags/yougile_etl_dag.py:41-45``). Transport injectable; tests capture
    messages, production passes an HTTP closure."""

    def __init__(self, send: Callable[[str], None]) -> None:
        self._send = send
        self.sent: list[str] = []

    def alert(self, text: str) -> None:
        self.sent.append(text)
        self._send(text)
