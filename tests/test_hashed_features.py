"""hashed_term_features (operators/text.py): hashing-trick semantics,
bucket bound, sparsity, and the staged round-6 `text_hashed_features`
DuckDB oracle, proven BEFORE registration."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.text import (
    hashed_term_features,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_term_frequencies_fold_into_buckets(spark):
    d = _docs(spark, ["x x y"])
    rows = hashed_term_features(d, dims=64).collect()
    tfs = sorted(r.tf for r in rows)
    # x and y may collide (one bucket, tf 3) or not (tf 2 + tf 1)
    assert tfs in ([1, 2], [3])
    assert all(0 <= r.bucket < 64 for r in rows)


def test_same_token_same_bucket_across_docs(spark):
    d = _docs(spark, ["alpha", "alpha"])
    rows = hashed_term_features(d, dims=1024).collect()
    assert len(rows) == 2
    assert rows[0].bucket == rows[1].bucket


def test_sparse_output_only_touched_buckets(spark):
    d = _docs(spark, ["one two three"])
    assert hashed_term_features(d, dims=10_000).count() <= 3


def test_empty_tokens_skipped(spark):
    d = _docs(spark, ["a  b"])  # double space yields an empty token
    rows = hashed_term_features(d, dims=64).collect()
    assert sum(r.tf for r in rows) == 2


def test_invalid_dims_raise(spark):
    with pytest.raises(ValueError):
        hashed_term_features(_docs(spark, ["a"]), dims=0)


_DIMS = 64

_ORACLE = f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents)
SELECT doc_id,
       CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {_DIMS}
         AS bucket,
       count(*) AS tf
FROM ex WHERE tok <> ''
GROUP BY 1, 2
"""


def test_hashed_features_duckdb_parity(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = hashed_term_features(docs, dims=_DIMS)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _ORACLE) == []
    assert got.count() > 0
