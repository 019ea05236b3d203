"""Multi-dimensional data layout: Z-order (Morton) clustering.

Sorting a table by one column gives parquet min/max footer stats that
prune scans on THAT column only; queries filtering the second dimension
read everything. Interleaving the bits of two normalized dimensions
(the Z-/Morton curve) gives a single sort key whose contiguous ranges
are small bounding boxes in BOTH dimensions — so range-partitioned,
sorted-by-z files carry tight footer stats on x AND y and either
predicate prunes. This is the standard lakehouse OPTIMIZE ZORDER BY
technique, expressed as portable Spark bit math.

Everything here is integer shifts/masks and one floor-normalized
division — bit-identical in the DuckDB oracle (`z_value_sql` generates
the twin expression from the same parameters).

Scale notes: the normalization bounds are one extra aggregate pass when
not supplied — at 100 TB pass `bounds=` from table statistics instead
(the curve does not need exact bounds, only fixed ones; stale stats
just skew the tiling). The z-map itself is map-only; the clustered
write is one range shuffle, the same cost as any sorted write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_manifest", "write_shards", "z_value", "z_value_sql", "zorder_key", "zorder_profile",
           "write_zordered", "write_bucketed", "file_profile",
           "compact_path"]


def z_value(x: Column, y: Column, *, bits: int = 10) -> Column:
    """Interleave the low `bits` bits of two non-negative long columns:
    bit b of x lands at position 2b, bit b of y at 2b+1. Pure
    shift/mask/or — codegen, no shuffle, deterministic."""
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(F.shiftleft(
            F.shiftrightunsigned(x, b).bitwiseAND(one), 2 * b))
        z = z.bitwiseOR(F.shiftleft(
            F.shiftrightunsigned(y, b).bitwiseAND(one), 2 * b + 1))
    return z


def z_value_sql(x_expr: str, y_expr: str, *, bits: int = 10) -> str:
    """DuckDB twin of `z_value` (same shifts, same OR tree)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_expr} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y_expr} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column into [0, 2^bits) as a long: floor of one
    IEEE double division (portable). Constant columns (hi == lo) map
    to 0."""
    span = (hi - lo).cast("double")
    scaled = F.floor((col - lo).cast("double")
                     * F.lit(float(2 ** bits - 1)) / span).cast("long")
    return F.when(span == 0, F.lit(0).cast("long")).otherwise(scaled)


def _bounds(df: DataFrame, x_col: str, y_col: str,
            bounds: tuple | None) -> DataFrame:
    """One row (xmin, xmax, ymin, ymax) — caller-supplied (table stats;
    the 100 TB path) or computed in one aggregate pass."""
    if bounds is not None:
        xmin, xmax, ymin, ymax = bounds
        row = [(xmin, xmax, ymin, ymax)]
        spark = df.sparkSession
        return spark.createDataFrame(
            row, "xmin long, xmax long, ymin long, ymax long")
    return df.agg(F.min(x_col).cast("long").alias("xmin"),
                  F.max(x_col).cast("long").alias("xmax"),
                  F.min(y_col).cast("long").alias("ymin"),
                  F.max(y_col).cast("long").alias("ymax"))


def zorder_key(df: DataFrame, x_col: str, y_col: str, *, bits: int = 10,
               bounds: tuple | None = None) -> DataFrame:
    """df + `zval` column: the Morton key of (x, y) normalized to the
    `bits`-bit grid. The bounds row is broadcast (one row), so the key
    computation stays map-only."""
    b = F.broadcast(_bounds(df, x_col, y_col, bounds))
    xy = df.crossJoin(b)
    xs = _normalize(F.col(x_col), F.col("xmin"), F.col("xmax"), bits)
    ys = _normalize(F.col(y_col), F.col("ymin"), F.col("ymax"), bits)
    return (xy.withColumn("zval", z_value(xs, ys, bits=bits))
              .drop("xmin", "xmax", "ymin", "ymax"))


def zorder_profile(df: DataFrame, x_col: str, y_col: str, *,
                   bits: int = 10, bucket_bits: int = 6,
                   bounds: tuple | None = None) -> DataFrame:
    """Clustering quality report: bucket rows by the top `bucket_bits`
    of the z-key (= the files a z-clustered write would produce) and
    emit each bucket's row count and (x, y) bounding box — exactly the
    parquet footer stats a scan would prune on. Tight boxes ⇒ either
    single-dimension predicate skips most buckets."""
    z = zorder_key(df, x_col, y_col, bits=bits, bounds=bounds)
    bucket = F.shiftrightunsigned(F.col("zval"), 2 * bits - bucket_bits)
    return (z.groupBy(bucket.alias("bucket"))
             .agg(F.count(F.lit(1)).alias("n_rows"),
                  F.min(x_col).cast("long").alias("x_lo"),
                  F.max(x_col).cast("long").alias("x_hi"),
                  F.min(y_col).cast("long").alias("y_lo"),
                  F.max(y_col).cast("long").alias("y_hi")))


def write_zordered(df: DataFrame, path: str, x_col: str, y_col: str, *,
                   n_files: int = 8, bits: int = 10,
                   bounds: tuple | None = None) -> None:
    """Z-clustered parquet write: range-partition on the Morton key and
    sort within partitions, so every output file covers one contiguous
    z-range = one small (x, y) box, and its footer min/max prune scans
    filtering EITHER column. One range shuffle — the cost of any
    sorted write."""
    z = zorder_key(df, x_col, y_col, bits=bits, bounds=bounds)
    (z.repartitionByRange(n_files, "zval")
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path))


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, *, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist as a hash-bucketed (and per-bucket sorted) parquet table —
    the layout that makes repeated joins/aggregations on `keys` free of
    their shuffle: two tables bucketed on the same keys with the same
    bucket count satisfy each other's HashClusteredDistribution, so the
    join plans with ZERO Exchange on either side (plan-audited), and the
    per-bucket sort feeds SortMergeJoin without a Sort node when files
    align.

    This is the "pay the shuffle once at write time" half of the layout
    story (Z-order is the scan-pruning half): at 100 TB a fact table
    joined every hour against its child on the same key amortizes one
    bucketed write across every downstream join. Bucket count is a
    layout constant — pick it for target-scale task sizing (bytes per
    bucket ≈ table / n_buckets), not for today's data."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def file_profile(spark, path: str,
                 *, target_file_bytes: int = 128 << 20) -> DataFrame:
    """Small-file diagnostic for a parquet dataset: one row per leaf
    directory (= table or partition) with file count, bytes, and the
    file count a compaction should rewrite to.

    The small-file problem is the quiet 100 TB killer: a mart appended
    hourly for a year holds ~10⁴ directories × many tiny files, and scan
    planning + footer reads + task scheduling start to dominate query
    time. The listing here is driver-side filesystem metadata via the
    Hadoop FileSystem API (exactly what a real lakehouse OPTIMIZE
    planner reads — never row data; works on hdfs://s3a://local alike);
    `recommended_files = ceil(bytes / target)` with a floor of 1.

    Verdicts: ``small-files`` (would merge ≥2× fewer files), ``ok``,
    ``oversized`` (files above ~2× target — split candidates)."""
    import math

    from yougile_etl_pipeline_spark import fsutil

    rows = []
    for leaf, sizes in fsutil.leaf_parquet_sizes(path).items():
        total = sum(sizes)
        rec = max(1, math.ceil(total / target_file_bytes))
        if len(sizes) >= 2 * rec:
            verdict = "small-files"
        elif max(sizes) > 2 * target_file_bytes:
            verdict = "oversized"
        else:
            verdict = "ok"
        rows.append((leaf if leaf else ".", len(sizes), total,
                     total // len(sizes), rec, verdict))
    return spark.createDataFrame(
        rows, "leaf_dir string, n_files int, total_bytes long, "
              "avg_file_bytes long, recommended_files int, verdict string")


def compact_path(spark, path: str,
                 *, target_file_bytes: int = 128 << 20) -> int:
    """Rewrite a (non-partitioned) parquet directory to its recommended
    file count via the crash-safe staging swap (`plans/incremental`
    contract: a crash leaves old or new intact, never half). Returns the
    new file count. Row data is preserved bit-for-bit; only layout
    changes — callers verify with a count/hash, tests do. Directory
    manipulation goes through fsutil (Hadoop FileSystem API), so the
    rewrite works on any scheme, not just local paths."""
    import math

    from yougile_etl_pipeline_spark import fsutil

    sizes = fsutil.leaf_parquet_sizes(path).get("", [])
    if not sizes:
        # partitioned dataset (or not a parquet dir): compact each leaf
        # via file_profile instead — rewriting through this path would
        # silently fold partition directories into one flat table.
        raise ValueError(
            f"{path} has no top-level parquet files; compact_path only "
            f"rewrites flat (non-partitioned) datasets")
    rec = max(1, math.ceil(sum(sizes) / target_file_bytes))
    df = spark.read.parquet(path)
    base = path.rstrip("/")
    staging, backup = base + "__staging", base + "__old"
    df.repartition(rec).write.mode("overwrite").parquet(staging)
    fsutil.rmtree(backup)
    fsutil.rename(path, backup)
    fsutil.rename(staging, path)
    fsutil.rmtree(backup)
    return rec


def corpus_manifest(df: DataFrame, key_col: str,
                    payload_cols: list[str], *,
                    n_shards: int = 16) -> DataFrame:
    """Release manifest for a sharded corpus: per shard, the row count
    and an ORDER-INDEPENDENT content checksum.

        shard_id  = md5-bucket of `key_col`   (hash_bucket: portable,
                    growth-stable routing)
        checksum  = sum over rows of int60(md5(row content)) as
                    DECIMAL(38,0) -- integer addition is associative/
                    commutative, so the checksum is identical at ANY
                    partitioning, engine, or file order (what makes a
                    distributed corpus checksum possible at all; md5
                    of the concatenated row content means any single-
                    bit payload change moves the sum).

    This is the artifact a corpus RELEASE ships next to the shards: a
    consumer re-runs the same manifest over what they downloaded and
    diffs -- row-count drift pins truncated shards, checksum drift
    pins corrupted ones. Fully oracle-pairable (exact ints end to
    end). One bounded aggregation: the shuffle carries <= n_shards
    rows after map-side partials.

    Row content = key and payload columns joined with the unit
    separator chr(31); payload columns are null-coalesced to a
    sentinel BEFORE concat (concat_ws skips nulls, which would make
    ('a', NULL, 'b') collide with ('a', 'b', NULL))."""
    from yougile_etl_pipeline_spark.operators.quality import hash_bucket

    sep = chr(31)
    parts = [F.col(key_col).cast("string")] + [
        F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
        for c in payload_cols]
    row_fp = F.conv(
        F.substring(F.md5(F.concat_ws(sep, *parts)), 1, 15),
        16, 10).cast("decimal(38,0)")
    return (df.withColumn("shard_id",
                          hash_bucket(key_col, n_shards).cast("int"))
              .groupBy("shard_id")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum(row_fp).alias("checksum")))


def write_shards(df: DataFrame, path: str, key_col: str,
                 payload_cols: list[str], *,
                 n_shards: int = 16) -> DataFrame:
    """Write the corpus partitioned by manifest shard (one directory
    per shard_id, routing identical to `corpus_manifest`) and return
    the manifest computed from the INPUT. The round-trip test
    re-manifests the written files and asserts equality -- the
    release-integrity contract. Routing by md5 bucket keeps shard
    membership stable as the corpus grows (append-only releases)."""
    from yougile_etl_pipeline_spark.operators.quality import hash_bucket

    (df.withColumn("shard_id", hash_bucket(key_col, n_shards).cast("int"))
       .repartition(n_shards, F.col("shard_id"))
       .write.mode("overwrite").partitionBy("shard_id").parquet(path))
    return corpus_manifest(df, key_col, payload_cols, n_shards=n_shards)
