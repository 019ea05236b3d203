"""SparkSession factory with the engine's pinned execution semantics.

Semantics pinned here (each is load-bearing for oracle parity or scale):

* ``spark.sql.session.timeZone=UTC`` — the reference floors epoch-ms
  timestamps in naive UTC (``dags/yougile_etl_dag.py:290-292``, pandas
  ``pd.to_datetime(unit='ms').dt.floor('d')``); Spark must not apply a
  local session zone or F5 date conversions drift by a day.
* AQE on — runtime partition coalescing and skew-join splitting are the
  100 TB answer to skewed fact keys; free on local mode too.
* ``autoBroadcastJoinThreshold`` left at default (10 MB) — every dimension
  ("hub") table in the mart build fits; Catalyst then picks broadcast-hash
  joins for J1/J3–J8 without manual hints (we still hint explicitly in
  `plans/mart.py` for self-documentation).
* Arrow enabled — every pandas interchange (tests, the multimodal
  `mapInPandas` path) goes through Arrow batches, never pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ENGINE_CONF"]

# Single source of truth for engine configuration; bench.py and tests reuse it.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: vectorized reader + filter pushdown are defaults, pinned
    # here so a misconfigured environment can't silently disable them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # ANSI off: the reference's permissive casts ('' -> NULL, malformed date
    # -> NULL) match Spark's legacy behavior (SURVEY.md §2.7 F4/F6 gotchas).
    "spark.sql.ansi.enabled": "false",
    # events.ts is parquet TIMESTAMP(NANOS) which Spark can't read natively;
    # read the raw int64 nanos and convert (sources/tables.py) — truncation
    # to micros matches DuckDB's ns handling.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": "32",
    # Keep the UI off in tests/bench: faster session start, no port clashes.
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "yougile-etl-pipeline-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's pinned semantics.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``).
    On a real cluster, pass ``master=None`` and set the master via
    spark-submit; the semantic configs still apply.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may return a pre-existing session whose builder configs were
    # ignored; re-assert the runtime-settable semantic ones.
    for k in ("spark.sql.session.timeZone", "spark.sql.ansi.enabled",
              "spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions"):
        spark.conf.set(k, conf[k])
    return spark
