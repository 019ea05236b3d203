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


def merge_upsert(spark: SparkSession, target_path: str, updates: DataFrame,
                 keys: list[str], *, partition_col: str | None = None) -> None:
    """MERGE (upsert) into a parquet mart: rows matching `keys` are
    replaced by `updates`, new keys are inserted (extension — the
    reference only appends).

    Scale strategy: with `partition_col`, only the partitions *touched by
    the updates* are rewritten, via dynamic partition overwrite — a
    100 TB target with a 1-partition update rewrites one directory. The
    anti-join keeps surviving rows; everything stays distributed (no
    collect, no full-table rewrite). Unpartitioned targets fall back to a
    staging-directory swap (small marts only; document Delta/Iceberg for
    transactional multi-writer needs).
    """
    import os
    import shutil

    target_exists = os.path.exists(target_path)
    if not target_exists:
        writer = updates.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
        return

    target = spark.read.parquet(target_path)

    if partition_col:
        touched = [r[0] for r in
                   updates.select(partition_col).distinct().collect()]
        survivors = (target
                     .filter(F.col(partition_col).isin(touched))
                     .join(updates.select(*keys).distinct(), keys,
                           "left_anti"))
        merged = survivors.unionByName(updates)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (merged.write.mode("overwrite").partitionBy(partition_col)
                   .parquet(target_path))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return

    merged = (target.join(updates.select(*keys).distinct(), keys, "left_anti")
              .unionByName(updates))
    staging = target_path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    shutil.rmtree(target_path)
    os.rename(staging, target_path)
