"""Spark Python Data Source for the paginated YouGile-style REST API.

The modern connector form of SURVEY.md §2.1 S1-S4: instead of a
driver-side fetch loop (``rest.py::fetch_entity``) or an RDD landing
job (``rest.py::fetch_partitioned``), the extract IS a Spark data
source — ``spark.read.format("yougile_rest")`` — so the per-column
cursors (S3, ``dags/yougile_etl_dag.py:203-217``) become real input
partitions the scheduler distributes, and the source composes with the
whole DataFrame API (filters, joins, writes) like any built-in format.

Each partition runs its own ``paging.next`` cursor with its own rate
limiter (S2) inside a Spark task. Rows are conformed on read: absent
keys surface as typed NULLs (P4 semantics, ``dag.py:90-94``).

Execution-semantics note (document, don't hide): like any non-replayed
source, every Spark ACTION re-reads its input — for exactly-once
landing semantics over a rate-limited API, extract with
``fetch_partitioned`` (which lands pages to files in one job) or write
this source's output to parquet immediately and query that. This
connector is the *queryable* form, not the raw-zone landing form.

The page fetcher is injectable via the ``fetcher`` option as an
importable ``"module:callable"`` path (executors re-import it — plain
functions only, no closures). Production passes an HTTP closure
factory; tests and demos use :func:`synthetic_fetch_page` (default), a
deterministic offline stand-in shaped exactly like the API envelope.
"""

from __future__ import annotations

import importlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

__all__ = ["YougileRestDataSource", "synthetic_fetch_page"]


def synthetic_fetch_page(method: str, offset: int, limit: int,
                         include_deleted: str, column_id: str | None):
    """Deterministic offline page server: 5 rows per column (3 when
    ``include_deleted='false'`` — the last 2 are flagged deleted),
    honoring offset/limit pagination with a real ``paging.next`` cursor.
    Row ids are stable functions of (method, column_id, index)."""
    key = column_id or "all"
    total = 5
    rows = [
        {
            "id": f"{method}-{key}-{i}",
            "title": f"{method} {key} #{i}",
            "column_id": key,
            "deleted": i >= 3,
        }
        for i in range(total)
    ]
    if include_deleted == "false":
        rows = [r for r in rows if not r["deleted"]]
    page = rows[offset:offset + limit]
    return {
        "content": page,
        "paging": {"next": offset + limit < len(rows)},
    }


def _resolve_fetcher(path: str):
    mod, _, attr = path.partition(":")
    if not attr:
        raise ValueError(
            f"fetcher option must be 'module:callable', got {path!r}")
    return getattr(importlib.import_module(mod), attr)


class _ColumnPartition(InputPartition):
    def __init__(self, column_id: str | None) -> None:
        self.column_id = column_id


class _RestReader(DataSourceReader):
    def __init__(self, schema, options: dict) -> None:
        self._schema = schema
        self._method = options.get("method", "tasks")
        self._limit = int(options.get("limit", "1000"))
        self._include_deleted = options.get("include_deleted", "false")
        self._interval_s = float(options.get("interval_s", "0"))
        self._fetcher_path = options.get(
            "fetcher",
            "yougile_etl_pipeline_spark.sources.rest_datasource"
            ":synthetic_fetch_page")
        ids = options.get("column_ids", "")
        self._column_ids = [c for c in ids.split(",") if c] or [None]

    def partitions(self):
        # one Spark input partition per API cursor (S3): the scheduler
        # fans the per-column fetches across executors
        return [_ColumnPartition(c) for c in self._column_ids]

    def read(self, partition: _ColumnPartition) -> Iterator[tuple]:
        # runs on an executor: own cursor, own rate limiter
        from yougile_etl_pipeline_spark.sources.rest import (
            RateLimiter,
            paginate,
        )

        fetch_page = _resolve_fetcher(self._fetcher_path)
        limiter = (RateLimiter(self._interval_s)
                   if self._interval_s > 0 else None)
        fields = [f.name for f in self._schema.fields]
        for row in paginate(
                fetch_page, self._method, limit=self._limit,
                include_deleted=self._include_deleted,
                column_id=partition.column_id, limiter=limiter):
            # conform-on-read (P4): absent keys -> NULL, extras dropped
            yield tuple(row.get(f) for f in fields)


class YougileRestDataSource(DataSource):
    """``spark.read.format("yougile_rest")`` — register with
    ``spark.dataSource.register(YougileRestDataSource)``.

    Options: ``method``, ``limit``, ``include_deleted``, ``column_ids``
    (comma-separated -> one partition per id), ``interval_s`` (rate
    limit), ``fetcher`` ("module:callable"). An explicit ``.schema(...)``
    is required — production file-less sources must never infer
    (SURVEY.md §1.3).
    """

    @classmethod
    def name(cls) -> str:
        return "yougile_rest"

    def schema(self):
        raise ValueError(
            "yougile_rest requires an explicit .schema(...) — a REST "
            "source has no self-describing schema and inference over an "
            "API is non-reproducible")

    def reader(self, schema) -> _RestReader:
        return _RestReader(schema, self.options)
