"""Regression guard for the round-1 driver failure class: the catalog must
be correct under ANY caller's SparkSession, not only ``session.get_spark``'s.

The external harness builds its own session with none of the engine's
configs; round 1 lost all 10 events-backed queries to exactly that
(``spark.sql.legacy.parquet.nanosAsLong`` unset -> PARQUET_TYPE_ILLEGAL).
These tests simulate a hostile caller by actively mis-setting the
correctness-critical confs, then require the catalog path to re-pin them
(sources/readers.ensure_session_confs) and still produce oracle-identical
results. scripts/driver_sim.py runs the full catalog under a from-scratch
hostile session; this is the fast in-suite version of the same guarantee.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

HOSTILE_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.session.timeZone": "America/New_York",
}
REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


@pytest.fixture
def hostile(spark):
    saved = {k: spark.conf.get(k) for k in HOSTILE_CONFS}
    for k, v in HOSTILE_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_events_query_repins_confs_and_runs(hostile, duck_smoke):
    """The round-1 killer: an events query under a session with nanosAsLong
    unset/false and a non-UTC timezone must still match its oracle."""
    fn = entry_mod.queries()["events_hourly_windows"]
    df = fn(hostile, SF_SMOKE)
    for key, want in REQUIRED_CONFS.items():
        assert hostile.conf.get(key) == want, key
    spark_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in df.collect()
    }
    oracle_rows = {
        (ws.replace(tzinfo=None) if ws.tzinfo else ws, et): (n, sv)
        for ws, et, n, sv in duck_smoke.execute(
            entry_mod.oracle_sql()["events_hourly_windows"]
        ).fetchall()
    }
    assert len(spark_rows) > 0
    assert spark_rows == oracle_rows


def test_timezone_sensitive_query_repins_utc(hostile, duck_smoke):
    """date_trunc/dayofweek-style queries shift under a non-UTC session;
    the catalog must pin UTC itself (session.py is not enough)."""
    queries = entry_mod.queries()
    name = next(
        n for n in ("orders_date_functions", "orders_by_year_month") if n in queries
    )
    df = queries[name](hostile, SF_SMOKE)
    assert hostile.conf.get("spark.sql.session.timeZone") == "UTC"
    assert df.count() > 0
