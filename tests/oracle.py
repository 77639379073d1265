"""Differential-comparison helpers for the test suite — re-exported from
the library (data_algorithms_with_pyspark_spark/verify.py), which is the
single source of truth also behind ``Engine.verify``."""

from __future__ import annotations

from data_algorithms_with_pyspark_spark.verify import (  # noqa: F401
    compare_spark_duckdb,
    rows_to_comparable,
)
