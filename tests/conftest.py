"""Shared fixtures: one session-scoped SparkSession (reference pattern,
tests/conftest.py:9-42 in /root/reference) plus a DuckDB oracle connection
with the testdata tables registered as views (the driver's t2 setup)."""

from __future__ import annotations

import duckdb
import pytest

from data_algorithms_with_pyspark_spark.schemas import TABLE_NAMES
from data_algorithms_with_pyspark_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield spark
    spark.stop()


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    con = make_duckdb(SF_SMOKE)
    yield con
    con.close()
