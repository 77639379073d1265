"""Smoke tests for the scaling-corpus generators (scripts/make_scale_*).

The PLANS.md scaling evidence depends on these staying runnable and
model-faithful: same column names/types as the driver tables, row
counts = base x mult, deterministic across runs. mult=1 keeps the
runtime to seconds."""

from __future__ import annotations

import runpy
import sys

import duckdb
import pytest

BASE = "/root/testdata/sf0.1"
_SCRIPTS = {
    "tpch": ("scripts/make_scale_tpch.py",
             ("supplier", "customer", "part", "orders", "lineitem",
              "nation", "region")),
    "events": ("scripts/make_scale_events.py", ("events",)),
}


def _run(script: str, out: str) -> None:
    argv = sys.argv
    sys.argv = [script, "1", out]
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = argv


@pytest.mark.parametrize("which", sorted(_SCRIPTS))
def test_generator_matches_base_model(tmp_path, which):
    script, tables = _SCRIPTS[which]
    out = str(tmp_path / which)
    _run(script, out)
    con = duckdb.connect()
    for t in tables:
        base_cols = con.execute(
            f"DESCRIBE SELECT * FROM '{BASE}/{t}.parquet'"
        ).fetchall()
        gen_cols = con.execute(
            f"DESCRIBE SELECT * FROM '{out}/{t}.parquet'"
        ).fetchall()
        assert [c[0] for c in gen_cols] == [c[0] for c in base_cols], t
        assert [c[1] for c in gen_cols] == [c[1] for c in base_cols], t
        n_base = con.execute(
            f"SELECT count(*) FROM '{BASE}/{t}.parquet'"
        ).fetchone()[0]
        n_gen = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        assert n_gen == n_base, t  # mult=1


def test_generators_are_deterministic(tmp_path):
    script, _ = _SCRIPTS["events"]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _run(script, a)
    _run(script, b)
    con = duckdb.connect()
    diff = con.execute(
        f"SELECT count(*) FROM ("
        f"  SELECT * FROM '{a}/events.parquet'"
        f"  EXCEPT SELECT * FROM '{b}/events.parquet')"
    ).fetchone()[0]
    assert diff == 0
