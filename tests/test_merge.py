"""Known-answer tests for the merge operators (upsert / CDC / SCD-2)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.merge import (
    apply_cdc,
    latest_change_per_key,
    scd2_apply,
    upsert,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "alice", 100.0), (2, "bob", 200.0), (3, "carol", 300.0)],
        ["id", "name", "bal"],
    )


def test_upsert_replaces_and_appends(spark):
    src = spark.createDataFrame(
        [(2, "bob", 250.0), (4, "dave", 50.0)], ["id", "name", "bal"]
    )
    out = {r["id"]: (r["name"], r["bal"]) for r in upsert(_target(spark), src, ["id"]).collect()}
    assert out == {
        1: ("alice", 100.0),
        2: ("bob", 250.0),
        3: ("carol", 300.0),
        4: ("dave", 50.0),
    }


def test_upsert_schema_mismatch_raises(spark):
    bad = spark.createDataFrame([(9, "x")], ["id", "name"])
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert(_target(spark), bad, ["id"])


def test_latest_change_per_key_picks_max_order(spark):
    changes = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        ["id", "seq", "val"],
    )
    got = {
        r["id"]: (r["seq"], r["val"])
        for r in latest_change_per_key(changes, ["id"], "seq").collect()
    }
    assert got == {1: (20, "new"), 2: (5, "only")}


def test_apply_cdc_insert_update_delete(spark):
    log = spark.createDataFrame(
        [
            (2, "bob", 225.0, "U", 1),
            (2, "bob", 250.0, "U", 2),  # later change wins
            (3, None, None, "D", 1),
            (4, "dave", 50.0, "I", 1),
        ],
        ["id", "name", "bal", "op", "seq"],
    )
    out = {
        r["id"]: (r["name"], r["bal"])
        for r in apply_cdc(
            _target(spark), log, ["id"], op_col="op", order_col="seq"
        ).collect()
    }
    assert out == {1: ("alice", 100.0), 2: ("bob", 250.0), 4: ("dave", 50.0)}


def test_scd2_closes_and_appends_versions(spark):
    t0 = datetime(2024, 1, 1)
    t1 = datetime(2024, 6, 1)
    t2 = datetime(2024, 9, 1)
    current = spark.createDataFrame(
        [
            (1, "alice", 100.0, t0, t1),   # closed history version
            (1, "alice", 150.0, t1, None),  # open
            (2, "bob", 200.0, t0, None),    # open, unchanged this batch
        ],
        ["id", "name", "bal", "valid_from", "valid_to"],
    )
    changes = spark.createDataFrame(
        [(1, "alice", 175.0, t2)], ["id", "name", "bal", "ts"]
    )
    out = scd2_apply(current, changes, ["id"], change_ts_col="ts")
    rows = sorted(
        (r["id"], r["bal"], r["valid_from"], r["valid_to"]) for r in out.collect()
    )
    assert rows == [
        (1, 100.0, t0, t1),    # untouched history
        (1, 150.0, t1, t2),    # closed by the change
        (1, 175.0, t2, None),  # new open version
        (2, 200.0, t0, None),  # unchanged open row passes through
    ]
    # exactly one open version per key
    open_counts = (
        out.where(out.valid_to.isNull()).groupBy("id").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_merge_partial_aggs_equals_full_recompute(spark):
    from data_algorithms_with_pyspark_spark.operators.merge import (
        merge_partial_aggs,
    )

    rows = [(i % 3, i % 2, i, 10 * i) for i in range(40)]
    df = spark.createDataFrame(rows, ["g1", "g2", "a", "b"])

    def agg(d):
        return d.groupBy("g1", "g2").agg(
            F.count("*").alias("n"),
            F.sum("a").alias("sum_a"),
            F.max("b").alias("max_b"),
            F.min("b").alias("min_b"),
        )

    stored = agg(df.where(F.col("a") % 5 != 0))
    delta = agg(df.where(F.col("a") % 5 == 0))
    merged = merge_partial_aggs(
        stored, delta, ["g1", "g2"],
        sum_cols=["n", "sum_a"], max_cols=["max_b"], min_cols=["min_b"],
    )
    full = agg(df)
    key = lambda r: (r["g1"], r["g2"])  # noqa: E731
    got = {key(r): (r["n"], r["sum_a"], r["max_b"], r["min_b"])
           for r in merged.collect()}
    want = {key(r): (r["n"], r["sum_a"], r["max_b"], r["min_b"])
            for r in full.collect()}
    assert got == want
