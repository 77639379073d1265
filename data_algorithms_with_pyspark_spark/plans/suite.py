"""Whole-suite smoke row: all 22 TPC-H queries as ONE catalog entry.

``tpch_suite_rowcounts`` lazily composes every q1-q22 plan into a single
22-way union of per-query row counts — one driver-attestable row set that
smoke-runs the entire decision-support suite in one execution (VERDICT r5
"optional surface" (c)). The oracle nests each query's own DuckDB oracle
inside ``SELECT count(*)``, so a green row certifies that EVERY suite
member still executes AND produces its oracle's cardinality — a cheap
whole-surface regression tripwire on top of the per-query value gates.

Scale note: the union members share scans where Spark's exchange/subquery
reuse finds them; each member's plan is individually lint-clean, and the
union adds no exchange of its own (count aggregates are 1-row inputs).
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Loaded AFTER the tpch/tpch_extended modules (catalog._QUERY_MODULES
# order), so the registry already holds every q* entry; reading it here
# (not via all_queries(), which would re-enter the in-progress load) keeps
# the suite automatically in sync with the implemented TPC-H surface.
from data_algorithms_with_pyspark_spark.plans.catalog import (
    _REGISTRY,
    register,
)

__all__ = ["tpch_suite_rowcounts"]

_TPCH_NAMES = tuple(
    sorted(
        (n for n in _REGISTRY if re.fullmatch(r"q\d+_\w+", n)),
        key=lambda n: int(re.match(r"q(\d+)", n).group(1)),
    )
)
if len(_TPCH_NAMES) != 22:  # not an assert: must also fire under python -O
    raise RuntimeError(
        f"TPC-H suite expects exactly 22 q<n>_* catalog queries, found "
        f"{len(_TPCH_NAMES)}: {_TPCH_NAMES}"
    )

_SUITE_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{name}' AS query_name,\n"
    f"       CAST((SELECT count(*) FROM ({_REGISTRY[name].oracle}) t_{name})"
    f" AS BIGINT) AS n_rows"
    for name in _TPCH_NAMES
)


@register(
    "tpch_suite_rowcounts",
    tags=("tpch", "suite", "audit"),
    description="All 22 TPC-H queries composed into ONE plan: per-query "
    "result row counts via a 22-way union of count aggregates — the "
    "whole-suite smoke row; the oracle nests each member's own oracle "
    "inside SELECT count(*)",
    oracle=_SUITE_ORACLE,
)
def tpch_suite_rowcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    members = [
        _REGISTRY[name]
        .fn(spark, sf_dir)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(name).alias("query_name"), "n_rows")
        for name in _TPCH_NAMES
    ]
    return reduce(DataFrame.unionByName, members)
