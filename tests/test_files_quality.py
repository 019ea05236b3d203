"""Tests for generic file IO (JSONL/CSV with quarantine) and quality ops."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.quality import (
    column_profile,
    deterministic_sample,
)
from yougile_etl_pipeline_spark.sources.files import (
    read_csv,
    read_jsonl,
    split_quarantine,
    write_csv,
    write_jsonl,
)
from yougile_etl_pipeline_spark.sources.tables import load_table

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text('{"id": 1, "name": "a"}\n'
                   '{"id": "not-a-number", "name": "b"}\n'
                   'not json at all\n')
    df = read_jsonl(spark, str(src), SCHEMA)
    good, bad = split_quarantine(df)
    assert good.count() == 1 and bad.count() == 2   # quarantined, not dropped
    out = tmp_path / "out"
    write_jsonl(good, str(out))
    back = read_jsonl(spark, str(out), SCHEMA)
    assert back.filter("id = 1 AND name = 'a'").count() == 1


def test_csv_roundtrip(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("id,name\n1,a\n2,b\n")
    df = read_csv(spark, str(src), SCHEMA)
    assert {r.id for r in df.collect()} == {1, 2}
    out = tmp_path / "out"
    write_csv(df.drop("_corrupt_record"), str(out))
    assert read_csv(spark, str(out), SCHEMA).count() == 2


def test_column_profile_single_pass(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    prof = {r.column_name: r
            for r in column_profile(o, ["o_orderkey", "o_orderstatus"]).collect()}
    n = o.count()
    assert prof["o_orderkey"].n_rows == n
    assert prof["o_orderkey"].n_nulls == 0
    assert prof["o_orderkey"].n_distinct == n          # primary key
    assert prof["o_orderstatus"].n_distinct <= 3


def test_deterministic_sample_stable_and_sized(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "k", F.concat_ws(":", "l_orderkey", "l_linenumber"))
    s1 = {(r.l_orderkey, r.l_linenumber)
          for r in deterministic_sample(li, "k").select(
              "l_orderkey", "l_linenumber").collect()}
    s2 = {(r.l_orderkey, r.l_linenumber)
          for r in deterministic_sample(li.repartition(13), "k").select(
              "l_orderkey", "l_linenumber").collect()}
    assert s1 == s2                                    # partitioning-invariant
    n = li.count()
    assert 0.03 < len(s1) / n < 0.10                   # ≈1/16


def test_key_skew_profile_flags_hot_key(spark):
    from yougile_etl_pipeline_spark.operators.quality import key_skew_profile
    rows = [("hot",)] * 80 + [(f"k{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top=5).collect()
    assert len(out) == 5
    top1 = out[0]
    assert top1.key == "hot" and top1.key_rows == 80
    assert abs(top1.row_share - 0.8) < 1e-12
    # 21 distinct keys, 100 rows -> mean 100/21; hot ratio = 80*21/100
    assert abs(top1.skew_ratio - 80 * 21 / 100) < 1e-12
    # remaining keys tie at 1 row; tie broken lexicographically
    assert [r.key for r in out[1:]] == ["k0", "k1", "k10", "k11"]
    for r in out[1:]:
        assert r.key_rows == 1 and abs(r.skew_ratio - 21 / 100) < 1e-12


def test_train_val_test_split_deterministic_and_leakproof(spark):
    import pytest
    from yougile_etl_pipeline_spark.operators.quality import (
        train_val_test_split,
    )
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    full = {r.doc_id: r.split
            for r in train_val_test_split(docs, "doc_id").collect()}
    n = len(full)
    shares = {s: sum(1 for v in full.values() if v == s) / n
              for s in ("train", "val", "test")}
    assert 0.8 < shares["train"] < 0.97
    assert shares["val"] > 0 and shares["test"] > 0
    # growth-invariance: labels computed on a SUBSET are identical to the
    # full corpus's — adding data never moves an existing doc across splits
    sub = {r.doc_id: r.split
           for r in train_val_test_split(
               docs.filter(F.col("doc_id") % 3 == 0).repartition(7),
               "doc_id").collect()}
    assert all(full[k] == v for k, v in sub.items())
    with pytest.raises(ValueError):
        train_val_test_split(docs, "doc_id", fractions=(0.5, 0.2, 0.2))


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC write -> read roundtrip; a filter on the read plan reaches the
    ORC scan as a pushed predicate (same scan-level pruning contract as
    parquet)."""
    from yougile_etl_pipeline_spark.sources.files import read_orc, write_orc

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 1.5).alias("v"))
    path = str(tmp_path / "colstore")  # name must not contain "orc"
    write_orc(df, path, partition_by=["g"])
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert {r.g for r in back.select("g").distinct().collect()} == set(range(7))
    flt = back.filter(F.col("k") < 10)
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "Format: ORC" in plan
    assert "LessThan(k,10)" in plan          # filter reached PushedFilters
    assert flt.count() == 10
    # partition pruning: the partition-column filter appears as a
    # PartitionFilter (directory pruning), not a data filter
    pruned = back.filter(F.col("g") == 3)
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(g" in pplan
    assert pruned.count() == df.filter(F.col("g") == 3).count()


def test_xml_roundtrip_and_quarantine(spark, tmp_path):
    """Native XML (Spark 4): write -> read roundtrip, and a malformed
    row lands in quarantine instead of failing the load."""
    from pyspark.sql import types as T

    from yougile_etl_pipeline_spark.sources.files import (
        read_xml,
        split_quarantine,
        write_xml,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    out = str(tmp_path / "xml_out")
    write_xml(df, out)
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("name", T.StringType())])
    back = read_xml(spark, out, schema)
    good, bad = split_quarantine(back)
    assert bad.count() == 0
    assert {(r.id, r.name) for r in good.collect()} == {(1, "a"), (2, "b")}

    broken = str(tmp_path / "xml_bad")
    import os
    os.makedirs(broken)
    with open(os.path.join(broken, "part.xml"), "w") as f:
        f.write("<rows><row><id>1</id><name>ok</name></row>"
                "<row><id>not_a_number</id><name>bad</name></row></rows>")
    good2, bad2 = split_quarantine(read_xml(spark, broken, schema))
    assert good2.count() == 1 and bad2.count() == 1
