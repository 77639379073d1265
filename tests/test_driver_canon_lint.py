"""Driver-canonicalizability lint: every catalog query's FINAL output must
survive the external harness's pandas canonicalization (sort_values over all
columns + per-row hashing of the oracle ``.df()`` against Spark's result).

Round 4 exposed two mechanical failure classes that produce red driver rows
even when the values are identical:

* **unhashable cells** — an ARRAY/MAP/STRUCT output column becomes a pandas
  object column of lists; ``sort_values``/hashing raises
  ``TypeError: unhashable type: 'list'`` (video_fingerprint_dedup_groups).
* **dtype divergence** — DuckDB widens ``sum(BIGINT)`` to HUGEINT, which
  ``.df()`` converts to float64 while Spark returns int64; the value hashes
  differ on every row (orders_cdc_replay's uncast total_cents).

This lint makes both classes impossible to reintroduce: for every catalog
query it (a) asserts the Spark FINAL schema contains no array/map/struct
column, and (b) runs the DuckDB oracle at sf0.001 and asserts each column's
pandas dtype is the one Spark's ``toPandas`` would produce for the Spark-side
type (integral -> int64 unless NULLs force widening, floating -> float64,
and no object cell is a list/dict/ndarray).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from data_algorithms_with_pyspark_spark.plans.catalog import all_queries
from tests.conftest import SF_SMOKE

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)

_UNHASHABLE = (list, dict, set, np.ndarray)


def _spark_kind(dt: T.DataType) -> str:
    """Collapse a Spark type to the pandas dtype.kind class the driver's
    Spark-side ``toPandas`` conversion produces (nulls excepted)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "M"
    # strings, dates, decimals, binary -> pandas object; all hashable.
    return "O"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_driver_canonicalizable(spark, duck_smoke, name):
    q = all_queries()[name]
    df = q.fn(spark, SF_SMOKE)

    # (a) Spark final schema: complex-typed output columns are
    # un-attestable by the driver (pandas cannot sort/hash list cells).
    complex_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not complex_cols, (
        f"{name}: complex-typed OUTPUT column(s) {complex_cols} — the driver's "
        "pandas canonicalization cannot hash/sort them; serialize to a string "
        "key on both engines (concat_ws / string_agg)"
    )

    if q.oracle is None:
        return  # rows-only query: no oracle side to lint

    # (b) Oracle .df() dtypes must be the ones Spark's toPandas produces.
    pdf = duck_smoke.execute(q.oracle).df()
    spark_types = {f.name: f.dataType for f in df.schema.fields}
    for col in pdf.columns:
        assert col in spark_types, (
            f"{name}: oracle column {col!r} missing from Spark schema "
            f"{sorted(spark_types)}"
        )
        want = _spark_kind(spark_types[col])
        got = pdf[col].dtype.kind
        if got == want:
            continue
        has_null = bool(pdf[col].isna().any())
        if want == "i" and got == "f" and has_null:
            continue  # NULLs widen integrals to float64 on BOTH engines
        if want == "b" and got == "O" and has_null:
            continue  # NULLs turn bool into object on both engines
        if want == "M" and got == "O":
            continue  # tz-aware timestamps can land as object; hashable
        if isinstance(spark_types[col], T.DateType) and got == "M":
            # Spark DATE -> pandas object(date) vs DuckDB DATE ->
            # datetime64: driver-attested compatible (its canonicalizer
            # compares the normalized datetimes equal — e.g.
            # events_hourly_daily_rollup green in CORRECTNESS_r03).
            continue
        assert False, (
            f"{name}: column {col!r} oracle dtype kind {got!r} != Spark-side "
            f"kind {want!r} (Spark type {spark_types[col]}) — the driver "
            "hash-compares raw values, so e.g. an uncast DuckDB sum(BIGINT) "
            "-> HUGEINT -> float64 red-flags an int64 Spark result; CAST the "
            "oracle column (cents_sum_sql convention)"
        )

    # (c) object columns must hold only hashable cells.
    for col in pdf.columns:
        if pdf[col].dtype.kind != "O":
            continue
        bad = pdf[col].map(lambda v: isinstance(v, _UNHASHABLE)).any()
        assert not bad, (
            f"{name}: oracle column {col!r} contains unhashable "
            "list/dict/ndarray cells — driver sort_values would raise"
        )
