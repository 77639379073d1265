"""Writers: the engine's sink surface (SURVEY.md §2.2, K1-K6).

Re-expresses the reference's writer patterns:

* modes overwrite/append/ignore/error (``csv_json_operations.py:96``)
* CSV with header / custom separator (``csv_json_operations.py:92-104``)
* hive-style ``partitionBy`` layout (``physical_partitioning.py:60-70``)
* the ``repartition(*cols)``-before-``partitionBy`` compaction trick that
  yields ONE file per disk partition (``physical_partitioning.py:73-84``,
  ``parquet_operations.py:41-53``; rationale ``chapter_05/README.md:152-162``)
* ``coalesce(1)`` single-file output (``etl_census_dataframe.py:37-39``) —
  exposed but discouraged at scale (it serializes the write).

Scale note: at 100 TB, ``single_file`` is wrong by construction; the right
compaction is ``repartition(partition_cols)`` (one task → one file per
hive partition) or a target file size via AQE + ``maxRecordsPerFile``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "write_parquet",
    "write_csv",
    "write_json",
    "write_orc",
    "write_range_clustered",
    "write_bucketed_table",
    "write_partitioned_table",
]


def _prepare(
    df: DataFrame,
    partition_by: tuple[str, ...] | None,
    compact: bool,
    single_file: bool,
) -> DataFrame:
    if single_file:
        return df.coalesce(1)
    if partition_by and compact:
        # One shuffle keyed on the partition columns => exactly one output
        # file per hive partition instead of (num_tasks × num_partitions).
        return df.repartition(*partition_by)
    return df


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] | None = None,
    compact: bool = True,
    single_file: bool = False,
) -> None:
    out = _prepare(df, partition_by, compact, single_file)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] | None = None,
    compact: bool = True,
    single_file: bool = False,
) -> None:
    """ORC sink with the same mode/partitioning/compaction surface as
    ``write_parquet`` (zlib default codec)."""
    out = _prepare(df, partition_by, compact, single_file)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    sep: str = ",",
    partition_by: tuple[str, ...] | None = None,
    compact: bool = True,
    single_file: bool = False,
) -> None:
    out = _prepare(df, partition_by, compact, single_file)
    writer = out.write.mode(mode).option("header", str(header).lower()).option("sep", sep)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    out = _prepare(df, None, False, single_file)
    out.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) catalog table.

    Bucketing is the pay-once-shuffle-never-again layout for the 100 TB
    design point: two tables bucketed on the same key with the same bucket
    count join with NO exchange on either side (and no sort, if sorted) —
    the shuffle happened at write time. The reference stops at hive-style
    ``partitionBy`` (physical_partitioning.py:60-84); bucketing is the
    co-location story it never reaches.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        _clear_orphaned_location(spark, table_name)
    writer = df.write.mode(mode).format(format).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def _clear_orphaned_location(spark, table_name: str) -> None:
    """A managed-table LOCATION can outlive its (session-scoped,
    in-memory) catalog entry — e.g. a previous process wrote the table
    and exited. saveAsTable refuses to adopt the orphaned directory even
    in overwrite mode (LOCATION_ALREADY_EXISTS), so clear it the way
    DROP TABLE would have."""
    if spark.catalog.tableExists(table_name):
        return
    import shutil
    from urllib.parse import urlparse

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    local = urlparse(warehouse)
    if local.scheme in ("", "file"):
        shutil.rmtree(
            f"{local.path or warehouse}/{table_name.lower()}",
            ignore_errors=True,
        )


def write_partitioned_table(
    df: DataFrame,
    table_name: str,
    partition_cols: tuple[str, ...],
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist as a hive-partitioned catalog table: each partition value
    becomes a directory, so an equality / IN filter on the partition
    column prunes whole directories at PLANNING time — zero I/O for
    unprobed partitions. This is the inverted-list layout the persisted
    ANN index uses (partition = IVF list id): query-time work is
    probed-lists-only by construction, the FAISS on-disk contract."""
    spark = df.sparkSession
    if mode == "overwrite":
        _clear_orphaned_location(spark, table_name)
    df.write.mode(mode).format(format).partitionBy(
        *partition_cols
    ).saveAsTable(table_name)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_by: tuple[str, ...],
    n_files: int,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on the
    cluster columns (range-disjoint files) + ``sortWithinPartitions``
    (clustered row groups within each file).

    This is the layout lever for scan-heavy tables: parquet keeps min/max
    statistics per row group, so a later ``WHERE cluster_col BETWEEN ...``
    skips whole files AND whole row groups instead of reading everything —
    the single biggest read win on a 100 TB fact table after hive
    partitioning (which handles the low-cardinality dims; range clustering
    handles the high-cardinality sort key, e.g. event time or order key).
    Spark samples the range bounds, so skew in ``cluster_by`` yields
    balanced files, unlike hash ``repartition``.
    """
    out = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
        *cluster_by
    )
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
