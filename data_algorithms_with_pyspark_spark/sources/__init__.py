"""IO layer: readers and writers for csv/json/parquet/text."""

from data_algorithms_with_pyspark_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_parquet,
    read_text,
    register_views,
)
from data_algorithms_with_pyspark_spark.sources.writers import (
    write_csv,
    write_json,
    write_parquet,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_text",
    "register_views",
    "write_csv",
    "write_json",
    "write_parquet",
]
