"""Partition-introspection debug operators (SURVEY.md §2.10 R2).

The reference inspects partitioning with RDD ``glom().collect()``
(``partition_basics.py:66-72``, ``mappartitions_transformation.py:190``) —
its own README says "never in production". The DataFrame-native equivalent
below keeps the capability but fixes the scale hazard: instead of
collecting every partition's CONTENTS to the driver, it aggregates one
row per partition distributedly and returns a tiny DataFrame of sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partition_sizes", "glom_sample"]


def partition_sizes(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows) per physical partition — the ``glom`` use
    case (skew/balance eyeballing) as a hash aggregate: the full dataset
    reduces map-side to one counter per partition, so this is safe to run
    on any size input, unlike ``rdd.glom().collect()``."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("partition_id")
    )


def glom_sample(df: DataFrame, rows_per_partition: int = 3) -> DataFrame:
    """First ``rows_per_partition`` rows of each partition, tagged with
    their partition id — the "peek at what's co-located" half of ``glom``,
    with a hard per-partition bound instead of a full collect. Window-free:
    a per-partition counter via ``mapInPandas`` would add a Python hop, so
    this stays JVM-side with a row_number over the partition id."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.spark_partition_id()).orderBy(F.lit(1))
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= rows_per_partition)
        .drop("_rn")
    )
