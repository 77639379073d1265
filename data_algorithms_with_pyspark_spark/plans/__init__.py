"""The engine's query catalog: named queries + DuckDB oracle SQL."""

from data_algorithms_with_pyspark_spark.plans.catalog import (
    CatalogQuery,
    all_queries,
    get_query,
)

__all__ = ["CatalogQuery", "all_queries", "get_query"]
