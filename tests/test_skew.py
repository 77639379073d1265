"""salted_join must be result-identical to the plain join on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 2000 rows, 80% on the hot key 1
    left = spark.range(2000).select(
        F.when(F.col("id") % 5 < 4, F.lit(1))
        .otherwise((F.col("id") % 50).cast("long"))
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    return left, right


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_matches_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, on="k", how="inner")
    salted = salted_join(left, right, on="k", n_salts=8, how="inner")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_left_keeps_unmatched(spark, skewed):
    left, right = skewed
    plain = left.join(right.where(F.col("k") < 5), on="k", how="left")
    salted = salted_join(
        left, right.where(F.col("k") < 5), on="k", n_salts=4, how="left"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_spreads_hot_key(spark, skewed):
    left, _ = skewed
    salts = (
        left.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)),
        )
        .where(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8  # hot key occupies every salt bucket


def test_rejects_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(left, right, on="k", how="full")


def test_skew_report_planted_hot_key(spark, tmp_path):
    """Planted 80/10/10 distribution: the hot key leads with exact
    integer basis-point share and x-mean percentage."""
    from data_algorithms_with_pyspark_spark.plans.catalog import get_query

    rows = [(i, 1 if i < 80 else (2 if i < 90 else 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long")
    sf_dir = str(tmp_path / "sf")
    df.write.parquet(f"{sf_dir}/orders.parquet")

    out = get_query("orders_key_skew_report").fn(spark, sf_dir).collect()
    assert [r["o_custkey"] for r in out] == [1, 2, 3]
    top = out[0]
    assert top["heavy_rank"] == 1 and top["n_rows"] == 80
    assert top["share_bp"] == 8000          # 80/100 in basis points
    assert top["x_mean_pct"] == 240         # 80 vs mean 33.3 -> 240%
    assert out[1]["share_bp"] == 1000 and out[1]["x_mean_pct"] == 30
