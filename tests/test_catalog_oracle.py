"""Differential test of EVERY oracle-backed catalog query against DuckDB —
the in-repo mirror of the driver's t2 correctness gate (at sf0.001 for
speed; the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from data_algorithms_with_pyspark_spark.plans.catalog import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle import compare_spark_duckdb

CATALOG = all_queries()
ORACLE_BACKED = sorted(name for name, q in CATALOG.items() if q.oracle)
ROWS_ONLY = sorted(name for name, q in CATALOG.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_matches_duckdb_oracle(spark, duck_smoke, name):
    q = CATALOG[name]
    df = q.fn(spark, SF_SMOKE)
    compare_spark_duckdb(df, duck_smoke, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = CATALOG[name]
    df = q.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
