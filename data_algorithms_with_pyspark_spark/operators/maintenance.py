"""Table-maintenance operators: small-file compaction for partitioned
parquet tables.

The writers (sources/writers.py) prevent small files at WRITE time
(repartition-before-partitionBy); this module is the maintenance half a
long-lived 100 TB table needs: streaming ingestion, per-hour backfills,
and late-arriving upserts all accrete small files that degrade scan
parallelism (one task per file floor) and NameNode/manifest pressure.
``compact_partitioned_table`` rewrites a hive-partitioned table to
size-targeted files while PRESERVING the partition layout and the exact
row multiset — the identity claim the catalog audit query proves
cross-engine via a content digest.

The reference has no table-maintenance surface (its sinks are one-shot
teaching writes, /root/reference/src/chapter_04); this is north-star
extension surface for the production pipeline.

Scale design: the only data-sized work is ONE shuffle keyed on
(partition columns, size-derived salt) — each (partition, salt) group is
owned by exactly one task, so output file counts are chosen per partition
(ceil(partition_bytes / target)) instead of the all-or-nothing
one-file-per-partition coalesce. File statistics come from the driver-side
Hadoop FileSystem listing, the same metadata pass Spark's own file index
performs; no row data ever reaches the driver.
"""

from __future__ import annotations

import math
import urllib.parse
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Directory-segment value hive writes for a NULL partition value.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

__all__ = [
    "PartitionStat",
    "partition_file_stats",
    "compact_partitioned_table",
]


@dataclass(frozen=True)
class PartitionStat:
    """File statistics for one hive partition directory.

    ``values`` holds the DECODED partition values: hive's ``%XX``
    directory escaping is reversed and the ``__HIVE_DEFAULT_PARTITION__``
    sentinel becomes ``None`` — so consumers compare against real column
    values, not directory spellings.
    """

    values: tuple[str | None, ...]  # decoded values, layout order
    n_files: int
    total_bytes: int


def _decode_segment(raw: str) -> str | None:
    """Reverse hive's directory-name encoding for one partition value:
    ``%XX`` escapes (``%`` ``:`` ``/`` ``=`` etc.) and the NULL
    sentinel directory."""
    if raw == _HIVE_NULL:
        return None
    return urllib.parse.unquote(raw)


def _hadoop_list(spark: SparkSession, path: str):
    """Recursively list (relative_dir, size) for every data file under
    ``path`` via the Hadoop FileSystem API (works for any supported
    filesystem, not just local)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []
    root_str = fs.makeQualified(root).toString().rstrip("/")
    it = fs.listFiles(root, True)
    out = []
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = p.rsplit("/", 1)[1]
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, hidden checksums
        rel = p[len(root_str) :].lstrip("/")
        rel_dir = rel.rsplit("/", 1)[0] if "/" in rel else ""
        out.append((rel_dir, int(st.getLen())))
    return out


def partition_file_stats(
    spark: SparkSession, path: str, partition_cols: tuple[str, ...]
) -> list[PartitionStat]:
    """Per-partition (file count, byte size) from the filesystem listing —
    the metadata a compaction planner needs, O(#files) driver work and
    zero executor I/O."""
    agg: dict[tuple[str, ...], list[int]] = {}
    for rel_dir, size in _hadoop_list(spark, path):
        parts = [seg for seg in rel_dir.split("/") if seg]
        values = []
        for col, seg in zip(partition_cols, parts):
            prefix = f"{col}="
            if not seg.startswith(prefix):
                raise ValueError(
                    f"unexpected layout under {path!r}: segment {seg!r} "
                    f"does not match partition column {col!r}"
                )
            values.append(_decode_segment(seg[len(prefix) :]))
        key = tuple(values)
        slot = agg.setdefault(key, [0, 0])
        slot[0] += 1
        slot[1] += size
    return [
        PartitionStat(values=k, n_files=v[0], total_bytes=v[1])
        for k, v in sorted(
            agg.items(),
            key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
        )
    ]


def compact_partitioned_table(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    partition_cols: tuple[str, ...],
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: tuple[str, ...] = (),
) -> dict:
    """Rewrite the hive-partitioned parquet table at ``src_path`` to
    ``dest_path`` with the SAME partition layout and size-targeted files:
    partition p gets ``ceil(bytes(p) / target_file_bytes)`` files.

    Row identity is exactly preserved (pure projection-free rewrite) and
    the operation is idempotent: the file split is hash-derived from row
    content, never random, so re-running produces the same layout.

    Two mechanisms compose:

    * **Size bound (exact)**: ``maxRecordsPerFile`` set to
      ``target_file_bytes / avg_bytes_per_row`` — every writer rolls to a
      new file at the size target, so oversized partitions SPLIT
      (coalesce-style compaction can't) and small ones collapse to one
      file, independent of task placement.
    * **Write parallelism (best effort)**: one shuffle keyed on
      (partition cols, salt) where salt = ``pmod(xxhash64(all columns),
      n_files(p))`` and n_files(p) = ceil(partition bytes / target) from
      the driver-side listing, joined in as a broadcast map — a 1 TB
      partition is rewritten by ~n_files(p) tasks instead of one
      straggler. Hash collisions between salt groups merely co-locate
      writes; the record cap above still enforces the size invariant.

    ``sort_within`` additionally clusters rows inside each output file
    (``sortWithinPartitions``): compaction is the natural moment to
    restore row-group min/max locality a churned table has lost, so a
    later ``WHERE sort_col BETWEEN ...`` skips whole row groups (the
    write_range_clustered layout, applied at maintenance time).

    Returns a report dict: partitions, files/bytes before, files after.
    """
    stats = partition_file_stats(spark, src_path, partition_cols)
    if not stats:
        raise ValueError(f"no data files under {src_path!r}")
    df = spark.read.parquet(src_path)
    # a partition column whose every value is NULL infers as VOID from the
    # directory names (there is no data-file schema for partition columns);
    # VOID cannot be written back with partitionBy — carry it as string.
    for c in partition_cols:
        if dict(df.dtypes).get(c) == "void":
            df = df.withColumn(c, F.col(c).cast("string"))
    total_bytes = sum(s.total_bytes for s in stats)
    total_rows = df.count()  # parquet metadata count, no data scan
    bytes_per_row = max(1.0, total_bytes / max(1, total_rows))
    records_per_file = max(1, int(target_file_bytes / bytes_per_row))
    plan_rows = [
        (*s.values, max(1, math.ceil(s.total_bytes / target_file_bytes)))
        for s in stats
    ]
    # partition values arrive as strings from the directory names; compare
    # against the table's own (possibly typed) columns by casting the
    # table side to string — the same canonicalization hive layout uses.
    # Explicit schema: a partition whose only value is NULL would otherwise
    # fail name-only type inference.
    plan_schema = T.StructType(
        [T.StructField(f"__{c}", T.StringType()) for c in partition_cols]
        + [T.StructField("__nf", T.LongType())]
    )
    plan = spark.createDataFrame(plan_rows, schema=plan_schema)
    cond = None
    for c in partition_cols:
        # eqNullSafe: __HIVE_DEFAULT_PARTITION__ decodes to NULL, and
        # NULL == NULL is NULL under plain equality — the inner join would
        # silently drop every NULL-partition row.
        eq = F.col(c).cast("string").eqNullSafe(F.col(f"__{c}"))
        cond = eq if cond is None else cond & eq
    data_cols = [c for c in df.columns]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in data_cols]), F.col("__nf")
    ).alias("__salt")
    salted = (
        df.join(F.broadcast(plan), on=cond, how="inner")
        .select(*data_cols, salt)
        .repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
        .drop("__salt")
    )
    if sort_within:
        salted = salted.sortWithinPartitions(
            *[F.col(c) for c in (*partition_cols, *sort_within)]
        )
    salted.write.mode("overwrite").option(
        "maxRecordsPerFile", records_per_file
    ).partitionBy(*partition_cols).parquet(dest_path)
    dest_rows = spark.read.parquet(dest_path).count()
    if dest_rows != total_rows:
        raise RuntimeError(
            f"compaction row-count mismatch: source {total_rows} rows, "
            f"destination {dest_rows} rows — refusing to report success "
            f"on a rewrite that lost or duplicated data"
        )
    after = partition_file_stats(spark, dest_path, partition_cols)
    return {
        "partitions": len(stats),
        "files_before": sum(s.n_files for s in stats),
        "bytes_before": sum(s.total_bytes for s in stats),
        "files_after": sum(s.n_files for s in after),
        "rows": total_rows,
    }
