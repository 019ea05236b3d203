"""Incremental snapshot loads — the reference's append-only hourly mart
semantics (``loaded_ts`` stamped per run, ``dags/yougile_etl_dag.py:280``,
16 appends/day ``:341``) made queryable at scale.

Layout: parquet partitioned by ``load_date`` (derived from ``loaded_ts``),
so every run appends new files into one partition directory — no rewrite,
and time travel prunes by directory. "Latest snapshot" discovery reads the
max stamp (cheap: one column over partition-pruned footers), never a
full-table window.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["append_snapshot", "read_latest_snapshot", "snapshot_changes"]


def append_snapshot(mart: DataFrame, path: str) -> None:
    """Append one run's mart (must carry ``loaded_ts``) partitioned by its
    load date."""
    (mart.withColumn("load_date",
                     F.date_format("loaded_ts", "yyyy-MM-dd"))
         .write.mode("append").partitionBy("load_date").parquet(path))


def read_latest_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """Rows of the most recent load only.

    Two-step on purpose: the max stamp is resolved first (tiny scan —
    at 100 TB: restrict to the lexicographically-last load_date partition,
    which partition pruning turns into one directory), then applied as a
    pushable equality filter — never a rank-over-everything window."""
    all_loads = spark.read.parquet(path)
    last_date = all_loads.agg(F.max("load_date")).collect()[0][0]
    latest_ts = (all_loads.filter(F.col("load_date") == last_date)
                 .agg(F.max("loaded_ts")).collect()[0][0])
    return all_loads.filter((F.col("load_date") == last_date)
                            & (F.col("loaded_ts") == latest_ts))


def snapshot_changes(history: DataFrame, keys: list[str],
                     tracked: list[str]) -> DataFrame:
    """Change log across snapshots: one row per (key, load) where any
    tracked attribute differs from the previous load — an SCD-style diff
    computed with one window over (keys ORDER BY loaded_ts). Shuffles on
    the business key once; comparisons are null-safe."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy("loaded_ts")
    changed = F.lit(False)
    for c in tracked:
        prev = F.lag(c).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.lag(tracked[0]).over(w).isNull() & \
        F.lag("loaded_ts").over(w).isNull()
    return (history
            .withColumn("is_first_load", first)
            .withColumn("changed", changed | first)
            .filter(F.col("changed"))
            .select(*keys, "loaded_ts", "is_first_load", *tracked))
