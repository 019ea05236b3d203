"""Generic file sources/sinks beyond parquet: JSONL and CSV.

Same production rules as the parquet reader (sources/tables.py): explicit
schema always (inference is a full extra pass over the data at 100 TB and
can silently drift types), permissive mode with a corrupt-record column
so bad rows are quarantined, not dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_jsonl", "read_csv", "write_jsonl", "write_csv",
           "read_orc", "write_orc", "read_xml", "write_xml",
           "split_quarantine"]

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    """Schema-first JSONL reader; malformed lines land in
    ``_corrupt_record`` (quarantine, don't drop — the D1 philosophy)."""
    return (spark.read
            .schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             *, header: bool = True, sep: str = ",") -> DataFrame:
    return (spark.read
            .schema(_with_corrupt(schema))
            .option("header", header)
            .option("sep", sep)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .csv(path))


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) split on the corrupt-record column.

    Spark forbids queries that reference *only* ``_corrupt_record`` on a
    raw file read (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    the documented pattern is to persist the parsed batch first. The
    cache is per-ingest-batch (bounded), not per-table — at scale the
    quarantine side is immediately written out and the cache released.
    """
    from pyspark.sql import functions as F

    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite",
              header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """ORC scan (columnar sibling of parquet — same vectorized reader,
    predicate pushdown, and column pruning). Schema optional: unlike
    JSON/CSV, ORC footers are self-describing, so no inference pass —
    pass one only to pin a contract (extra columns pruned, missing ones
    error loudly at analysis)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    """ORC write — interop sink for Hive-ecosystem consumers; same
    layout options as the parquet mart writer."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_xml(spark: SparkSession, path: str, schema: T.StructType,
             *, row_tag: str = "row") -> DataFrame:
    """XML scan (native source since Spark 4 — no external package).
    Same contract as JSONL/CSV: explicit schema, PERMISSIVE mode with a
    corrupt-record column so malformed rows quarantine instead of
    failing the load (feed through ``split_quarantine``)."""
    return (spark.read.format("xml")
            .option("rowTag", row_tag)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .schema(_with_corrupt(schema))
            .load(path))


def write_xml(df: DataFrame, path: str, *, row_tag: str = "row",
              mode: str = "overwrite") -> None:
    """XML write — interop sink for XML-consuming systems."""
    (df.write.format("xml").option("rowTag", row_tag)
       .mode(mode).save(path))
