"""Spark-vs-DuckDB differential comparison — the library form of the
external driver's t2 gate: row count, column names, and order-insensitive
value comparison. Used by ``Engine.verify`` for self-service checks and
re-exported by tests/oracle.py for the differential test suite."""

from __future__ import annotations

import math
from datetime import datetime
from typing import Any

import duckdb
from pyspark.sql import DataFrame


def _normalize(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # fold -0.0
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    if isinstance(v, int):
        return v
    return v


def rows_to_comparable(rows: list[tuple], columns: list[str]) -> list[tuple]:
    """Sort columns by name, then rows — order-insensitive canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize(row[i]) for i in order) for row in rows]
    return sorted(out, key=repr)


def compare_spark_duckdb(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> None:
    """Assert the Spark result and the DuckDB oracle result are identical
    (names, row count, and values, order-insensitively)."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    s = rows_to_comparable(spark_rows, spark_cols)
    d = rows_to_comparable(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
