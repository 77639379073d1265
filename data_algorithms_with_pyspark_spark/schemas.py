"""Explicit StructType schemas for every engine table.

Schema policy follows the reference's three modes
(``csv_json_operations.py:46-84``, ``parquet_operations.py:36-38`` in
/root/reference): inference allowed at the user API, explicit StructTypes for
the engine's own tables ("required for production pipelines",
``csv_json_operations.py:74``), embedded schemas for parquet.

These mirror the driver-generated testdata parquet footers (TESTDATA.md /
FIXTURES.md §2). Explicit schemas let readers skip inference scans and let
the engine validate inputs up front — at 100 TB an inference pass is a full
extra read of the dataset.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = ["TABLE_SCHEMAS", "TABLE_NAMES"]

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), False),
            T.StructField("r_name", T.StringType(), False),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), False),
            T.StructField("n_name", T.StringType(), False),
            T.StructField("n_regionkey", T.IntegerType(), False),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), False),
            T.StructField("c_name", T.StringType(), False),
            T.StructField("c_nationkey", T.IntegerType(), False),
            T.StructField("c_acctbal", T.DoubleType(), False),
            T.StructField("c_mktsegment", T.StringType(), False),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), False),
            T.StructField("s_name", T.StringType(), False),
            T.StructField("s_nationkey", T.IntegerType(), False),
            T.StructField("s_acctbal", T.DoubleType(), False),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), False),
            T.StructField("p_name", T.StringType(), False),
            T.StructField("p_brand", T.StringType(), False),
            T.StructField("p_type", T.StringType(), False),
            T.StructField("p_size", T.IntegerType(), False),
            T.StructField("p_retailprice", T.DoubleType(), False),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), False),
            T.StructField("o_custkey", T.LongType(), False),
            T.StructField("o_orderstatus", T.StringType(), False),
            T.StructField("o_totalprice", T.DoubleType(), False),
            T.StructField("o_orderdate", T.TimestampType(), False),
            T.StructField("o_orderpriority", T.StringType(), False),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), False),
            T.StructField("l_partkey", T.LongType(), False),
            T.StructField("l_suppkey", T.LongType(), False),
            T.StructField("l_linenumber", T.IntegerType(), False),
            T.StructField("l_quantity", T.DoubleType(), False),
            T.StructField("l_extendedprice", T.DoubleType(), False),
            T.StructField("l_discount", T.DoubleType(), False),
            T.StructField("l_tax", T.DoubleType(), False),
            T.StructField("l_returnflag", T.StringType(), False),
            T.StructField("l_linestatus", T.StringType(), False),
            T.StructField("l_shipdate", T.TimestampType(), False),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(TABLE_SCHEMAS)
