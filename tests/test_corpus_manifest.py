"""Corpus release sharding + order-independent manifest
(operators/layout.py::corpus_manifest/write_shards): checksum algebra,
null-collision safety, the write round-trip integrity contract, and
the staged round-6 `corpus_shard_manifest` DuckDB oracle, proven
bit-identical BEFORE registration."""

from __future__ import annotations

import tempfile

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.layout import (
    corpus_manifest,
    write_shards,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_checksum_is_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = sorted(map(tuple, corpus_manifest(
        docs.repartition(1), "doc_id", ["text", "lang"]).collect()))
    b = sorted(map(tuple, corpus_manifest(
        docs.repartition(13, "lang"), "doc_id", ["text", "lang"]).collect()))
    assert a == b
    assert sum(r[1] for r in a) == docs.count()


def test_single_bit_payload_change_moves_checksum(spark):
    base = _docs(spark, [(1, "hello world", "en"), (2, "abc", "en")])
    tweaked = _docs(spark, [(1, "hello worle", "en"), (2, "abc", "en")])
    m1 = {r["shard_id"]: r["checksum"]
          for r in corpus_manifest(base, "doc_id", ["text", "lang"]).collect()}
    m2 = {r["shard_id"]: r["checksum"]
          for r in corpus_manifest(tweaked, "doc_id",
                                   ["text", "lang"]).collect()}
    assert m1 != m2


def test_null_position_does_not_collide(spark):
    a = _docs(spark, [(1, None, "x")])
    b = _docs(spark, [(1, "x", None)])
    ca = corpus_manifest(a, "doc_id", ["text", "lang"]).collect()
    cb = corpus_manifest(b, "doc_id", ["text", "lang"]).collect()
    assert ca[0]["checksum"] != cb[0]["checksum"]


def test_write_round_trip_matches_manifest(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
                     .select("doc_id", "text", "lang")
    with tempfile.TemporaryDirectory(prefix="shards_") as d:
        path = f"{d}/corpus"
        want = sorted(map(tuple, write_shards(
            docs, path, "doc_id", ["text", "lang"], n_shards=8).collect()))
        back = spark.read.parquet(path)
        got = sorted(map(tuple, corpus_manifest(
            back, "doc_id", ["text", "lang"], n_shards=8).collect()))
        assert got == want
        assert len(got) == 8
        # shard routing on disk matches the manifest routing
        mismatch = back.filter(
            "shard_id != CAST(CONV(SUBSTRING(MD5(CAST(doc_id AS STRING)), "
            "1, 8), 16, 10) % 8 AS INT)").count()
        assert mismatch == 0


# Staged round-6 oracle: manifest of documents keyed by doc_id with
# (text, lang) payload, 16 shards. The >int64 checksum is stringified
# at the query boundary on BOTH sides (pandas renders DuckDB HUGEINT /
# wide DECIMAL as float, destroying exactness -- the same boundary
# rule as array outputs; registration must keep the casts).
_ORACLE = """
SELECT
  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
       % 16 AS INT) AS shard_id,
  count(*) AS n_rows,
  CAST(SUM(CAST(('0x' || substr(md5(
        CAST(doc_id AS VARCHAR) || chr(31)
        || COALESCE(text, '<NULL>') || chr(31)
        || COALESCE(lang, '<NULL>')), 1, 15)) AS BIGINT))
    AS VARCHAR) AS checksum
FROM documents
GROUP BY 1
"""


def test_corpus_manifest_duckdb_parity(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    from pyspark.sql import functions as F

    got = (corpus_manifest(docs, "doc_id", ["text", "lang"], n_shards=16)
           .withColumn("checksum", F.col("checksum").cast("string")))
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []


def test_shard_filter_prunes_partitions(spark):
    """A single-shard read of the written layout must touch only that
    shard's files — partition pruning is the layout's scale payoff
    (a consumer re-verifying one shard reads 1/n of the corpus)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
                     .select("doc_id", "text", "lang")
    with tempfile.TemporaryDirectory(prefix="shards_") as d:
        path = f"{d}/corpus"
        write_shards(docs, path, "doc_id", ["text", "lang"], n_shards=8)
        one = spark.read.parquet(path).filter("shard_id = 3")
        # inputFiles() reports the pre-pruning relation; the pruning
        # contract lives in the scan's PartitionFilters
        plan = one._jdf.queryExecution().executedPlan().toString()
        pf = next((ln for ln in plan.splitlines()
                   if "PartitionFilters" in ln), "")
        assert "shard_id" in pf and "= 3" in pf.replace("=3", "= 3")
        # and the pruned read returns exactly the shard-3 rows
        direct = spark.read.parquet(f"{path}/shard_id=3")
        assert one.count() == direct.count() > 0
