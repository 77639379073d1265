"""Driver-side typed CSV loader — parity port of the reference's
``src/common/data_loader.py:20-65`` (SURVEY.md §2.1 S9).

The reference loads small CSVs into a list of NamedTuples on the driver
(its examples are tiny); the Spark-first engine covers real CSV ingestion
with ``sources.readers.read_csv``. This shim exists so a user of the
reference can run the same call shape here, and so the typed-record idiom
has a sanctioned on-ramp INTO the distributed engine:
``records_to_dataframe`` turns the loaded records into a DataFrame, which
is the only thing that should ever happen to them at scale.

Deliberately driver-side and bounded: ``max_rows`` guards against someone
pointing it at a real dataset (use ``read_csv`` for that — it scales;
this does not).
"""

from __future__ import annotations

import csv
from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

__all__ = ["load_csv_as_tuples", "records_to_dataframe"]

T = TypeVar("T")


def load_csv_as_tuples(
    csv_path: str,
    record_factory: Callable[..., T],
    skip_header: bool = True,
    max_rows: int = 100_000,
) -> list[T]:
    """Load a small CSV into typed records via ``record_factory`` (a
    NamedTuple class or any callable taking the row's string fields).

    Raises if the file exceeds ``max_rows``: the driver-side loader is a
    compatibility/teaching surface, not an ingestion path.
    """
    records: list[T] = []
    with open(csv_path, newline="") as fh:
        reader = csv.reader(fh)
        if skip_header:
            next(reader, None)
        for row in reader:
            if not row:
                continue
            records.append(record_factory(*row))
            if len(records) > max_rows:
                raise ValueError(
                    f"{csv_path} exceeds max_rows={max_rows}; use "
                    "sources.readers.read_csv — the distributed scan — "
                    "for real data"
                )
    return records


def records_to_dataframe(
    spark: SparkSession, records: list, schema=None
) -> DataFrame:
    """The scale on-ramp: NamedTuple records -> DataFrame (S1 parallelize;
    field names become columns). Everything downstream is ordinary Spark."""
    return spark.createDataFrame(records, schema=schema)
