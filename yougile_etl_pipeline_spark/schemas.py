"""Explicit schemas + the schema-conform operator (SURVEY.md §1.2/§2.2 P4).

The reference's single most load-bearing schema behavior is *forcible
conformance*: ``pd.json_normalize`` yields whatever keys appear, then missing
expected columns are added as all-null and the frame is projected to the
expected list (``dags/yougile_etl_dag.py:90-94``). `conform` reproduces that
exactly: absent fields become typed NULL literals, present fields are kept,
and the output is selected in target-schema order.

Two schema families:

* TESTDATA_SCHEMAS — the ten driver tables (TPC-H-ish; FIXTURES.md §A).
  Production rule: never infer — `sources.tables.load_table` asserts the
  parquet footer matches these.
* YouGile raw shapes — the five REST entity collections the reference
  ingests (FIXTURES.md §B, reconstructed from ``dags/yougile_etl_dag.py``).
  `stickers` is modeled as ``MapType(string,string)`` instead of the
  reference's dynamic dotted columns ``stickers.<uuid>``
  (``dags/yougile_etl_dag.py:176,182-193``) — same information, stable
  schema, map access via ``element_at``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "TESTDATA_SCHEMAS",
    "TESTDATA_TABLES",
    "YOUGILE_SCHEMAS",
    "conform",
]


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


_str = T.StringType()
_i32 = T.IntegerType()
_i64 = T.LongType()
_f64 = T.DoubleType()
_ts = T.TimestampType()
_bool = T.BooleanType()

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", _i32), ("r_name", _str)),
    "nation": _s(("n_nationkey", _i32), ("n_name", _str), ("n_regionkey", _i32)),
    "customer": _s(
        ("c_custkey", _i64), ("c_name", _str), ("c_nationkey", _i32),
        ("c_acctbal", _f64), ("c_mktsegment", _str),
    ),
    "supplier": _s(
        ("s_suppkey", _i64), ("s_name", _str), ("s_nationkey", _i32),
        ("s_acctbal", _f64),
    ),
    "part": _s(
        ("p_partkey", _i64), ("p_name", _str), ("p_brand", _str),
        ("p_type", _str), ("p_size", _i32), ("p_retailprice", _f64),
    ),
    "orders": _s(
        ("o_orderkey", _i64), ("o_custkey", _i64), ("o_orderstatus", _str),
        ("o_totalprice", _f64), ("o_orderdate", _ts), ("o_orderpriority", _str),
    ),
    "lineitem": _s(
        ("l_orderkey", _i64), ("l_partkey", _i64), ("l_suppkey", _i64),
        ("l_linenumber", _i32), ("l_quantity", _f64), ("l_extendedprice", _f64),
        ("l_discount", _f64), ("l_tax", _f64), ("l_returnflag", _str),
        ("l_linestatus", _str), ("l_shipdate", _ts),
    ),
    "events": _s(
        ("event_id", _i64), ("ts", _ts), ("user_id", _i64),
        ("event_type", _str), ("value", _f64), ("props", _str),
    ),
    # Physical shape of events on disk: ts is TIMESTAMP(NANOS), which Spark
    # reads only as int64 (spark.sql.legacy.parquet.nanosAsLong); the reader
    # converts to the logical TimestampType above (micros, truncated — same
    # as DuckDB's ns→us handling).
    "_events_raw": _s(
        ("event_id", _i64), ("ts", _i64), ("user_id", _i64),
        ("event_type", _str), ("value", _f64), ("props", _str),
    ),
    "documents": _s(
        ("doc_id", _i64), ("text", _str), ("lang", _str), ("source", _str),
        ("n_chars", _i64),
    ),
    "embeddings": _s(
        ("vec_id", _i64),
        ("embedding", T.ArrayType(T.FloatType(), True)),
        ("label", _i32),
    ),
}

TESTDATA_TABLES: tuple[str, ...] = tuple(
    n for n in TESTDATA_SCHEMAS if not n.startswith("_"))

# YouGile REST entity shapes (FIXTURES.md §B; envelope content rows only).
_state = T.StructType(
    [T.StructField("id", _str), T.StructField("name", _str)]
)
_deadline = T.StructType(
    [T.StructField("startDate", _i64), T.StructField("deadline", _i64)]
)
YOUGILE_SCHEMAS: dict[str, T.StructType] = {
    # dags/yougile_etl_dag.py:111-118
    "boards": _s(("id", _str), ("title", _str), ("projectId", _str)),
    # dags/yougile_etl_dag.py:121-129
    "columns": _s(("id", _str), ("title", _str), ("boardId", _str)),
    # dags/yougile_etl_dag.py:143-159 (nested states array, exploded by R1)
    "string_stickers": _s(
        ("id", _str), ("name", _str),
        ("states", T.ArrayType(_state, True)),
    ),
    # dags/yougile_etl_dag.py:171-176,203-222; stickers as a map, deadline a struct
    "tasks": _s(
        ("id", _str), ("title", _str), ("timestamp", _i64),
        ("columnId", _str),
        ("subtasks", T.ArrayType(_str, True)),
        ("stickers", T.MapType(_str, _str, True)),
    ),
    # dags/yougile_etl_dag.py:179-195,225
    "subtasks": _s(
        ("id", _str), ("title", _str), ("deleted", _bool),
        ("stickers", T.MapType(_str, _str, True)),
        ("deadline", _deadline),
    ),
}


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Force *df* to *schema*: add missing columns as typed NULLs, cast
    present ones, and project in schema order.

    Spark-native port of the reference's add-missing-as-null + reorder step
    (``dags/yougile_etl_dag.py:90-94``). Extra columns are dropped (the
    reference's trailing bracket-projection does the same). Pure projection:
    no shuffle, fully prunable by Catalyst at any scale.
    """
    present = set(df.columns)
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in present
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)
