"""Paginated REST extractor — Spark-native port of SURVEY.md §2.1 S1–S4.

The reference's extractor (``dags/yougile_etl_dag.py:48-76``) loops
``GET {base}/{method}?offset&limit&includeDeleted[&columnId]``, follows the
``paging.next`` cursor, sleeps 1.5 s between pages (≤50 req/min API cap,
``:72-73``), and concatenates ``content`` pages. Tasks are additionally
fetched *per column* to dodge an upstream offset-pagination bug
(``:201-217`` — the S3 "partitioned scan" pattern).

Design for Spark:

* A cursor-paginated, rate-limited API is inherently serial per cursor —
  that loop stays on the driver (or, at scale, inside one task per
  partition key). What must NOT stay driver-side is the *data volume*:
  `fetch_entity` lands pages as JSONL and hands Spark a path, so the
  DataFrame is produced by a distributed `spark.read.schema(S).json` scan,
  not a giant `createDataFrame` from driver memory.
* `fetch_partitioned` parallelizes across *independent* cursors (one per
  column id) with `spark.range(n).repartition(n).mapPartitions(fetch)` —
  the JDBC-`partitionColumn`-style parallel scan; each task honors its own
  rate limiter.
* Transport is injectable (`fetch_page`) so tests exercise pagination,
  rate limiting, and schema conformance hermetically — no network, no
  `requests` dependency.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from yougile_etl_pipeline_spark.schemas import conform

__all__ = ["RateLimiter", "paginate", "fetch_entity", "fetch_partitioned",
           "with_retry"]

# A page fetcher: (method, offset, limit, include_deleted, column_id) -> envelope
# Envelope shape (dags/yougile_etl_dag.py:61-65):
#   {"content": [...], "paging": {"next": bool}}
PageFetcher = Callable[[str, int, int, str, str | None], dict]


def with_retry(fetch_page: PageFetcher, *, retries: int = 2,
               backoff_s: float = 1.0,
               sleep: Callable[[float], None] = time.sleep) -> PageFetcher:
    """D3 — wrap a fetcher with retry + exponential backoff (the reference
    relies on Airflow ``retries: 2``, ``dags/yougile_etl_dag.py:31``; here
    the extract retries per page, so one flaky request doesn't replay the
    whole entity). Spark task retries cover the compute side."""
    def wrapped(method, offset, limit, include_deleted, column_id):
        attempt = 0
        while True:
            try:
                return fetch_page(method, offset, limit, include_deleted,
                                  column_id)
            except Exception:
                if attempt >= retries:
                    raise
                sleep(backoff_s * (2 ** attempt))
                attempt += 1
    return wrapped


class RateLimiter:
    """Token-less fixed-interval limiter: ≥ `interval_s` between calls.

    Port of the reference's ``time.sleep(1.5)`` pacing
    (``dags/yougile_etl_dag.py:73,211``) — but only sleeps the *remaining*
    interval, so processing time counts toward the budget.
    """

    def __init__(self, interval_s: float = 1.5,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep) -> None:
        self.interval_s = interval_s
        self._clock = clock
        self._sleep = sleep
        self._last: float | None = None

    def wait(self) -> None:
        now = self._clock()
        if self._last is not None:
            remaining = self.interval_s - (now - self._last)
            if remaining > 0:
                self._sleep(remaining)
                now = self._clock()
        self._last = now


def paginate(
    fetch_page: PageFetcher,
    method: str,
    *,
    limit: int = 1000,
    include_deleted: str = "false",
    column_id: str | None = None,
    limiter: RateLimiter | None = None,
) -> Iterator[dict]:
    """Yield entity rows across pages, following the ``paging.next`` cursor.

    Faithful to ``dags/yougile_etl_dag.py:55-76``: offset advances by
    `limit`; iteration stops when ``paging.next`` is falsy.
    """
    offset = 0
    while True:
        if limiter is not None:
            limiter.wait()
        envelope = fetch_page(method, offset, limit, include_deleted, column_id)
        content = envelope.get("content") or []
        yield from content
        if not envelope.get("paging", {}).get("next"):
            return
        offset += limit


def _land_jsonl(rows: Iterable[dict], landing_dir: str, name: str) -> str:
    """Write rows to ``{landing_dir}/{name}.jsonl`` (raw zone) and return
    the path. Keeping a raw landed copy makes the extract replayable and
    the Spark read distributed."""
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, f"{name}.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    return path


def fetch_entity(
    spark: SparkSession,
    fetch_page: PageFetcher,
    method: str,
    schema: T.StructType,
    *,
    limit: int = 1000,
    include_deleted: str = "false",
    column_id: str | None = None,
    limiter: RateLimiter | None = None,
    landing_dir: str | None = None,
) -> DataFrame:
    """Extract one entity collection to a schema-conformed DataFrame.

    S1+S4: paginate → land JSONL → ``spark.read.schema(S).json`` → `conform`
    (P4 — absent keys become typed NULLs, exactly like the reference's
    add-missing-as-null at ``dags/yougile_etl_dag.py:90-94``).
    """
    landing_dir = landing_dir or tempfile.mkdtemp(prefix="yg_landing_")
    rows = paginate(
        fetch_page, method, limit=limit, include_deleted=include_deleted,
        column_id=column_id, limiter=limiter,
    )
    suffix = f"_{column_id}" if column_id else ""
    path = _land_jsonl(rows, landing_dir, f"{method}{suffix}")
    raw = spark.read.schema(schema).json(path)
    return conform(raw, schema)


def fetch_partitioned(
    spark: SparkSession,
    fetch_page: PageFetcher,
    method: str,
    schema: T.StructType,
    column_ids: list[str],
    *,
    limit: int = 1000,
    include_deleted: str = "false",
    interval_s: float = 1.5,
    landing_dir: str | None = None,
) -> DataFrame:
    """S3 partitioned scan: one independent cursor per `column_id`, executed
    *inside Spark tasks* (`mapPartitions`), unioned by name.

    This is the scale path for the reference's per-column task fetch
    (``dags/yougile_etl_dag.py:203-217``): N keys → N tasks, each with its
    own rate limiter, results distributed from the start. `fetch_page` must
    be picklable (tests pass a module-level fake; production passes a thin
    HTTP closure over config primitives).

    Each task LANDS its pages as a JSONL file (same raw-zone discipline as
    `fetch_entity`) and the returned DataFrame reads those files — the
    HTTP pagination runs in exactly ONE Spark job, triggered here. An
    earlier formulation built the DataFrame directly over the fetch RDD,
    which re-executed the paginated fetch (duplicate API calls, re-paid
    rate-limit sleeps, and two actions could observe different data) on
    EVERY downstream action. `landing_dir` must be visible to executors
    and driver (local mode: any tmpdir; cluster: shared storage).
    """
    if not column_ids:
        return spark.createDataFrame([], schema)
    landing_dir = landing_dir or tempfile.mkdtemp(prefix="yg_landing_")
    os.makedirs(landing_dir, exist_ok=True)
    n = len(column_ids)
    sc = spark.sparkContext
    ids_rdd = sc.parallelize(column_ids, n)

    def fetch_part(idx: int, ids: Iterable[str]) -> Iterator[str]:
        limiter = RateLimiter(interval_s)

        def rows() -> Iterator[dict]:
            for cid in ids:
                yield from paginate(
                    fetch_page, method, limit=limit,
                    include_deleted=include_deleted, column_id=cid,
                    limiter=limiter,
                )

        yield _land_jsonl(rows(), landing_dir, f"{method}_part{idx:05d}")

    # ONE action runs every cursor and lands the pages; the DataFrame
    # below scans the landed files, so further actions never re-fetch.
    paths = ids_rdd.mapPartitionsWithIndex(fetch_part).collect()
    raw = spark.read.schema(schema).json(paths)
    return conform(raw, schema)
