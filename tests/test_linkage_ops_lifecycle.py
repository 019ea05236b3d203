"""Fuzzy linkage behavior + mart lifecycle ops (erasure scrub, small-file
compaction) — the mutation operators have no SQL-oracle form, so their
contracts are pytest-verified like the sinks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.operators.layout import (
    compact_path,
    file_profile,
)
from yougile_etl_pipeline_spark.operators.linkage import (
    fuzzy_join,
    fuzzy_self_join,
)
from yougile_etl_pipeline_spark.plans.incremental import scrub_keys


# ---------------------------------------------------------------------------
# Fuzzy linkage
# ---------------------------------------------------------------------------

def test_fuzzy_self_join_finds_typos(spark):
    rows = [
        (1, "acme corporation berlin"),
        (2, "acme corporatoin berlin"),    # transposition, dist 2
        (3, "acme corp berlin"),           # abbreviation, dist 7
        (4, "globex industries munich"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = {(r.id_a, r.id_b): r.dist
             for r in fuzzy_self_join(df, "id", "name",
                                      max_dist=3).collect()}
    assert pairs == {(1, 2): 2}

    wide = {(r.id_a, r.id_b)
            for r in fuzzy_self_join(df, "id", "name",
                                     max_dist=8).collect()}
    assert (1, 3) in wide and (4, 1) not in wide


def test_fuzzy_join_two_tables_and_token_cap(spark):
    left = spark.createDataFrame(
        [(1, "zeta payments ltd"), (2, "omega logistics ltd")],
        "id long, name string")
    right = spark.createDataFrame(
        [(10, "zeta payment ltd"), (11, "unrelated name here")],
        "id long, name string")
    out = {(r.left_id, r.right_id): r.dist
           for r in fuzzy_join(left, right, ("id", "name"), ("id", "name"),
                               max_dist=2).collect()}
    assert out == {(1, 10): 1}
    # cap=0 removes every blocking token -> no candidates, not a crash
    assert fuzzy_join(left, right, ("id", "name"), ("id", "name"),
                      max_dist=2, max_token_df=0).count() == 0


# ---------------------------------------------------------------------------
# Erasure scrub
# ---------------------------------------------------------------------------

@pytest.fixture()
def mart(spark, tmp_path):
    path = str(tmp_path / "mart")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("part"),
        (F.col("id") * 10).alias("v"))
    df.write.partitionBy("part").parquet(path)
    return path


def test_scrub_keys_partition_pruned(spark, mart):
    victims = spark.createDataFrame([(8,), (12,)], "k long")  # both part=0
    before = {d: os.path.getmtime(os.path.join(mart, d))
              for d in os.listdir(mart) if d.startswith("part=")}
    removed = scrub_keys(spark, mart, victims, ["k"], partition_col="part")
    assert removed == 2
    after = spark.read.parquet(mart)
    assert after.filter(F.col("k").isin(8, 12)).count() == 0
    assert after.count() == 398
    # untouched partitions were not rewritten
    untouched = {d: os.path.getmtime(os.path.join(mart, d))
                 for d in os.listdir(mart) if d.startswith("part=")
                 and d != "part=0"}
    assert untouched == {d: t for d, t in before.items() if d != "part=0"}


def test_scrub_keys_drops_emptied_partition(spark, mart):
    part3 = spark.read.parquet(mart).filter("part = '3'").select("k")
    removed = scrub_keys(spark, mart, part3, ["k"], partition_col="part")
    assert removed == 100
    assert not os.path.exists(os.path.join(mart, "part=3"))
    assert spark.read.parquet(mart).count() == 300


def test_scrub_keys_unpartitioned_swap(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(0, 100).select(F.col("id").alias("k")).write.parquet(path)
    removed = scrub_keys(
        spark, path, spark.createDataFrame([(5,), (6,), (999,)], "k long"),
        ["k"])
    assert removed == 2
    assert spark.read.parquet(path).count() == 98
    assert not os.path.exists(path + "__staging")
    assert not os.path.exists(path + "__old")


def test_scrub_keys_noop_when_no_match(spark, mart):
    assert scrub_keys(spark, mart,
                      spark.createDataFrame([(99999,)], "k long"),
                      ["k"], partition_col="part") == 0
    assert spark.read.parquet(mart).count() == 400


# ---------------------------------------------------------------------------
# Small-file profile + compaction
# ---------------------------------------------------------------------------

def test_file_profile_flags_fragmentation(spark, tmp_path):
    frag = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(40).write.parquet(frag)
    prof = {r.leaf_dir: r for r in
            file_profile(spark, frag, target_file_bytes=1 << 20).collect()}
    row = prof["."]
    assert row.n_files == 40
    assert row.verdict == "small-files"
    assert row.recommended_files < 40


def test_compact_path_preserves_rows(spark, tmp_path):
    frag = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(40).write.parquet(frag)
    before = spark.read.parquet(frag).agg(F.sum("id")).collect()[0][0]
    n = compact_path(spark, frag, target_file_bytes=1 << 20)
    files = [f for f in os.listdir(frag) if f.endswith(".parquet")]
    assert len(files) == n < 40
    assert spark.read.parquet(frag).agg(F.sum("id")).collect()[0][0] == before
    prof = file_profile(spark, frag, target_file_bytes=1 << 20).collect()
    assert prof[0].verdict == "ok"


def test_compact_path_refuses_partitioned_dataset(spark, tmp_path):
    path = str(tmp_path / "parted")
    (spark.range(0, 100)
     .select(F.col("id"), (F.col("id") % 2).alias("pt"))
     .write.partitionBy("pt").parquet(path))
    with pytest.raises(ValueError, match="non-partitioned"):
        compact_path(spark, path, target_file_bytes=1 << 20)
