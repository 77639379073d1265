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
