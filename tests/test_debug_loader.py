"""Tests for the S9 driver-side loader shim and R2 glom-equivalent
partition introspection (the last two SURVEY §2 items)."""

from __future__ import annotations

from typing import NamedTuple

import pytest

from data_algorithms_with_pyspark_spark.operators.debug import (
    glom_sample,
    partition_sizes,
)
from data_algorithms_with_pyspark_spark.sources.data_loader import (
    load_csv_as_tuples,
    records_to_dataframe,
)


class Person(NamedTuple):
    name: str
    city: str
    age: str


def test_load_csv_as_tuples_and_dataframe_onramp(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("name,city,age\nada,london,36\ngrace,dc,45\n")
    recs = load_csv_as_tuples(str(p), Person)
    assert recs == [Person("ada", "london", "36"), Person("grace", "dc", "45")]
    df = records_to_dataframe(spark, recs)
    assert df.columns == ["name", "city", "age"]
    assert df.count() == 2

    with pytest.raises(ValueError, match="max_rows"):
        load_csv_as_tuples(str(p), Person, max_rows=1)


def test_partition_sizes_sums_to_total_and_bounded(spark):
    df = spark.range(1000).repartition(8)
    sizes = partition_sizes(df).collect()
    assert sum(r["n_rows"] for r in sizes) == 1000
    assert 1 <= len(sizes) <= 8

    sample = glom_sample(df, rows_per_partition=2)
    per_part = (
        sample.groupBy("partition_id").count().collect()
    )
    assert all(r["count"] <= 2 for r in per_part)
    assert sample.count() <= 2 * 8


# --- Engine facade ----------------------------------------------------------


def test_engine_facade(spark):
    from data_algorithms_with_pyspark_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)
    assert "q1_pricing_summary" in eng.names()
    assert "dedup_exact_groups" in eng.names(tag="dedup")
    desc = eng.describe("q1_pricing_summary")
    assert "DuckDB value oracle" in desc
    assert eng.run("q1_pricing_summary").count() == 6
    plan = eng.explain("q6_forecast_revenue")
    assert "Physical Plan" in plan and "PushedFilters" in plan
    assert eng.table("nation").count() == 25
    eng.tables()
    assert spark.sql("SELECT count(*) n FROM region").collect()[0]["n"] == 5
    try:
        eng.get("no_such_query")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "unknown query" in str(e)
