"""Structural tests for the derived partsupp relation and the TPC-H
Q2/Q11/Q20 shapes built on it (plans/tpch_extended.py). Value-level
correctness is covered by the catalog oracle gate; these pin the
construction invariants the oracle's replay shares (and so cannot
falsify on its own)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.plans.tpch_extended import (
    derived_partsupp,
)
from tests.conftest import SF_SMOKE


def test_partsupp_four_distinct_suppliers_per_part(spark):
    ps = derived_partsupp(spark, SF_SMOKE)
    per_part = ps.groupBy("p_partkey").agg(
        F.count("*").alias("n"),
        F.count_distinct("ps_suppkey").alias("n_sup"),
    )
    bad = per_part.where(
        (F.col("n") != 4) | (F.col("n_sup") != 4)
    ).count()
    assert bad == 0


def test_partsupp_suppkeys_are_real_suppliers(spark):
    ps = derived_partsupp(spark, SF_SMOKE)
    supplier = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")
    orphans = ps.join(
        supplier,
        ps.ps_suppkey == supplier.s_suppkey,
        "left_anti",
    ).count()
    assert orphans == 0


def test_partsupp_values_positive_and_bounded(spark):
    ps = derived_partsupp(spark, SF_SMOKE)
    bad = ps.where(
        (F.col("ps_availqty") < 1)
        | (F.col("ps_availqty") > 9999)
        | (F.col("ps_supplycost_cents") < 1)
        | (F.col("ps_supplycost_cents") > 100000)
    ).count()
    assert bad == 0


def test_q2_exactly_one_supplier_per_part(spark):
    """Supply costs are distinct within a part by construction, so the
    min-cost join-back must keep exactly one row per part."""
    from data_algorithms_with_pyspark_spark.plans.tpch_extended import (
        q2_min_cost_supplier,
    )

    out = q2_min_cost_supplier(spark, SF_SMOKE)
    dup = (
        out.groupBy("p_partkey")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup == 0


def test_partsupp_offsets_distinct_for_any_supplier_count():
    """The 4 key offsets (i * (S // 4)) % S are pairwise distinct for
    every supplier count S >= 4 — the documented validity bound of the
    derivation (pure arithmetic, no Spark)."""
    for s in range(4, 1201):
        offs = {(i * (s // 4)) % s for i in range(4)}
        assert len(offs) == 4, s
