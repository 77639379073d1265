"""Global ordered row indexing without the single-partition trap.

Assigning contiguous global row numbers (training-sample ids, shard
offsets) under a total order is a classic Spark scale trap: the obvious
``row_number().over(Window.orderBy(...))`` plans a WINDOW over ONE
partition — every row funnels through a single task, which is exactly the
kind of "works on 60k rows, dies at 100 TB" plan this engine exists to
avoid. The reference never faces this (its examples are single-node); a
training-data pipeline faces it constantly.

The scale-correct decomposition here:

1. ``repartitionByRange(order_cols)`` — ONE range-exchange shuffle, the
   unavoidable cost of a total order, fully parallel;
2. persist — pins the (sampled, hence otherwise nondeterministic) range
   boundaries so the two downstream jobs see identical partitions;
3. per-partition counts — a count-only aggregate collecting ONE row per
   partition to the driver (thousands of rows, not the corpus);
4. exclusive prefix-sum of the counts on the driver, broadcast-joined
   back on partition id;
5. ``sortWithinPartitions`` + ``monotonically_increasing_id`` — the local
   row index inside each sorted partition comes from the mono-id's low 33
   bits (mono_id = pid << 33 | local_idx by construction), all JVM-side,
   zero additional shuffles.

Total data motion: one range shuffle. Driver state: one long per
partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["global_row_index"]

_MONO_PARTITION_SHIFT = 33  # monotonically_increasing_id() = pid << 33 | idx


def global_row_index(
    df: DataFrame,
    order_cols: list[str | Column],
    index_col: str = "row_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``index_col``: contiguous 0-based global row numbers under the
    total order given by ``order_cols``.

    ``order_cols`` must define a TOTAL order (include a unique tiebreaker
    column); ties straddling a range-partition boundary would otherwise
    make the numbering nondeterministic.

    The input is persisted (MEMORY_AND_DISK) for the duration of the two
    passes — inherent to any count-then-number scheme; the alternative
    (a second full shuffle onto partition id to fuse both passes into one
    window job) moves the whole corpus again instead of re-reading it.
    """
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    ).persist(StorageLevel.MEMORY_AND_DISK)

    counts = (
        parted.groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .collect()  # one row per partition
    )
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["count"]
    offset_df = parted.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _offset long"
    )

    mono = F.monotonically_increasing_id()
    local = mono - (
        F.shiftleft(F.spark_partition_id().cast("long"), _MONO_PARTITION_SHIFT)
    )
    numbered = (
        parted.sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_local", local)
        .join(F.broadcast(offset_df), on="_pid")
        .withColumn(index_col, (F.col("_offset") + F.col("_local")))
        .drop("_pid", "_local", "_offset")
    )
    return numbered
