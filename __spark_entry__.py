"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` exposes the full catalog (one entry per implemented operator
from SURVEY.md §2 + north-star extensions); ``oracle_sql()`` the matching
DuckDB SQL for every SQL-expressible query. Single source of truth is
``data_algorithms_with_pyspark_spark.plans.catalog``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_algorithms_with_pyspark_spark.plans.catalog import all_queries

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["q1_pricing_summary"].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented catalog query; callables take (spark, sf_dir)."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query. Every catalog query has one except
    ``approx_distinct_users_hll`` (built-in HLL internals are not
    replayable in another engine; its exact twin ``exact_distinct_users``
    brackets the estimate and the md5-lane ``portable_hll_distinct_users``
    carries a full value oracle for the estimate itself)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
