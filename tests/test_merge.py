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


def test_orders_cdc_replay_counts_and_checksum(spark):
    """Independent invariants (not the oracle's replay): after the I/U/D
    merge, the surviving key set is exactly {k : k % 11 != 0} and the
    checksum equals base price + 250 cents for every %5 key — both
    computable in one pass over the raw table without any merge logic."""
    from data_algorithms_with_pyspark_spark.plans.pipelines import (
        orders_cdc_replay,
    )
    from tests.conftest import SF_SMOKE

    got = {
        r["o_orderstatus"]: (r["n_orders"], r["total_cents"])
        for r in orders_cdc_replay(spark, SF_SMOKE).collect()
    }
    base = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
        )
        .where(F.col("o_orderkey") % 11 != 0)
        .withColumn(
            "expected_cents",
            F.col("price_cents")
            + F.when(F.col("o_orderkey") % 5 == 0, F.lit(250)).otherwise(0),
        )
    )
    want = {
        r["o_orderstatus"]: (r["n"], r["cents"])
        for r in base.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("expected_cents").alias("cents"))
        .collect()
    }
    assert got == want


def test_customer_scd2_history_version_chains(spark):
    """Structural invariants over the full history: per-key version count
    is 1 + [k%4==0] + [k%6==0], exactly one open version per key, and
    each closed version's valid_to equals its successor's valid_from."""
    from data_algorithms_with_pyspark_spark.plans.pipelines import (
        customer_scd2_history,
    )
    from tests.conftest import SF_SMOKE

    hist = customer_scd2_history(spark, SF_SMOKE).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["c_custkey"], []).append(r)
    for k, rows in by_key.items():
        expect = 1 + (k % 4 == 0) + (k % 6 == 0)
        assert len(rows) == expect, (k, rows)
        rows.sort(key=lambda r: r["valid_from"])
        opens = [r for r in rows if r["valid_to"] is None]
        assert len(opens) == 1 and opens[0] is rows[-1]
        for prev, nxt in zip(rows, rows[1:]):
            assert prev["valid_to"] == nxt["valid_from"], (k, rows)


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


class TestSnapshotDiff:
    @staticmethod
    def _digest():
        from pyspark.sql import functions as F

        return F.md5(
            F.concat_ws(
                "\x01",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x01N"))
                    for c in ("v", "w")
                ],
            )
        )

    def test_classifies_iud(self, spark):
        from data_algorithms_with_pyspark_spark.operators.merge import (
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "v", "w"]
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20), (4, "d", 40)], ["k", "v", "w"]
        )
        got = {
            r["k"]: r["change"]
            for r in snapshot_diff(old, new, ["k"], self._digest()).collect()
        }
        assert got == {2: "U", 3: "D", 4: "I"}  # key 1 unchanged -> absent

    def test_null_payload_distinguished(self, spark):
        from data_algorithms_with_pyspark_spark.operators.merge import (
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [(1, None, 5)], "k long, v string, w long"
        )
        new = spark.createDataFrame([(1, "", 5)], "k long, v string, w long")
        got = snapshot_diff(old, new, ["k"], self._digest()).collect()
        assert [(r["k"], r["change"]) for r in got] == [(1, "U")]

    def test_roundtrip_reconstructs_new(self, spark):
        from pyspark.sql import functions as F

        from data_algorithms_with_pyspark_spark.operators.merge import (
            apply_cdc,
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (5, "e", 50)],
            ["k", "v", "w"],
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 21), (4, "d", 40), (5, "e", 50)],
            ["k", "v", "w"],
        )
        diff = snapshot_diff(old, new, ["k"], self._digest())
        # I/U images come from the new snapshot; D needs only the key.
        images = diff.where(F.col("change") != "D").join(new, on="k")
        deletes = diff.where(F.col("change") == "D").select(
            "k", F.lit(None).cast("string").alias("v"),
            F.lit(None).cast("long").alias("w"), F.col("change"),
        )
        batch = images.select("k", "v", "w", "change").unionByName(deletes)
        rebuilt = apply_cdc(
            old,
            batch.withColumn("seq", F.lit(1)),
            ["k"],
            op_col="change",
            order_col="seq",
        )
        assert sorted(
            (r["k"], r["v"], r["w"]) for r in rebuilt.collect()
        ) == sorted((r["k"], r["v"], r["w"]) for r in new.collect())
