"""Small-file compaction operator: layout, identity, idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.maintenance import (
    compact_partitioned_table,
    partition_file_stats,
)
from data_algorithms_with_pyspark_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _fragment_orders(spark, path: str, n_tasks: int = 6) -> None:
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    orders.repartition(n_tasks, F.col("o_orderkey")).write.mode(
        "overwrite"
    ).partitionBy("o_year").parquet(path)


def _rows(spark, path: str):
    df = spark.read.parquet(path)
    return sorted(
        tuple(r) for r in df.select(*sorted(df.columns)).collect()
    )


def test_compact_collapses_small_files(spark, tmp_path):
    frag, comp = str(tmp_path / "frag"), str(tmp_path / "comp")
    _fragment_orders(spark, frag)
    before = partition_file_stats(spark, frag, ("o_year",))
    assert all(s.n_files > 1 for s in before), "fixture must be fragmented"
    report = compact_partitioned_table(
        spark, frag, comp, ("o_year",), target_file_bytes=1 << 36
    )
    after = partition_file_stats(spark, comp, ("o_year",))
    assert [s.values for s in after] == [s.values for s in before]
    assert all(s.n_files == 1 for s in after)
    assert report["files_after"] == len(before)
    assert report["files_before"] == sum(s.n_files for s in before)
    # row identity: the rewrite moved every row exactly once
    assert _rows(spark, comp) == _rows(spark, frag)


def test_compact_splits_oversized_partition(spark, tmp_path):
    frag, comp = str(tmp_path / "frag"), str(tmp_path / "comp")
    _fragment_orders(spark, frag)
    stats = partition_file_stats(spark, frag, ("o_year",))
    # a target far below any partition's bytes forces every partition to
    # SPLIT into multiple size-bounded files — the case coalesce-style
    # compaction cannot express
    target = max(1, min(s.total_bytes for s in stats) // 3)
    compact_partitioned_table(
        spark, frag, comp, ("o_year",), target_file_bytes=target
    )
    after = partition_file_stats(spark, comp, ("o_year",))
    assert all(s.n_files >= 2 for s in after)
    assert _rows(spark, comp) == _rows(spark, frag)


def test_compact_is_idempotent(spark, tmp_path):
    frag = str(tmp_path / "frag")
    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    _fragment_orders(spark, frag)
    r1 = compact_partitioned_table(
        spark, frag, c1, ("o_year",), target_file_bytes=1 << 36
    )
    # compacting an already-compacted table changes nothing: same
    # partition layout, same file counts, same rows
    r2 = compact_partitioned_table(
        spark, c1, c2, ("o_year",), target_file_bytes=1 << 36
    )
    assert r2["files_before"] == r1["files_after"] == r2["files_after"]
    assert _rows(spark, c2) == _rows(spark, frag)


def test_partition_file_stats_rejects_wrong_layout(spark, tmp_path):
    flat = str(tmp_path / "flat")
    load_table(spark, SF_SMOKE, "region").write.parquet(flat)
    stats = partition_file_stats(spark, flat, ())
    assert len(stats) == 1 and stats[0].values == ()
    with pytest.raises(ValueError, match="does not match partition column"):
        # files sit at the root, so there is no r_name=... segment
        _fragment = str(tmp_path / "frag2")
        _fragment_orders(spark, _fragment, n_tasks=2)
        partition_file_stats(spark, _fragment, ("wrong_col",))


def test_compact_empty_source_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no data files"):
        compact_partitioned_table(
            spark, str(tmp_path / "nothing"), str(tmp_path / "out"), ("x",)
        )


def test_compact_multi_column_string_partitions(spark, tmp_path):
    """Layout preservation with a (string, long) two-level hive layout —
    the directory-name canonicalization path (string cast join)."""
    frag, comp = str(tmp_path / "frag"), str(tmp_path / "comp")
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    orders.repartition(5, F.col("o_orderkey")).write.mode(
        "overwrite"
    ).partitionBy("o_orderpriority", "o_year").parquet(frag)
    before = partition_file_stats(
        spark, frag, ("o_orderpriority", "o_year")
    )
    assert any(s.n_files > 1 for s in before)
    compact_partitioned_table(
        spark,
        frag,
        comp,
        ("o_orderpriority", "o_year"),
        target_file_bytes=1 << 36,
    )
    after = partition_file_stats(spark, comp, ("o_orderpriority", "o_year"))
    assert [s.values for s in after] == [s.values for s in before]
    assert all(s.n_files == 1 for s in after)
    assert _rows(spark, comp) == _rows(spark, frag)


def test_compact_preserves_null_partition_rows(spark, tmp_path):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__; the plan
    join must be null-safe or those rows silently vanish (the r7 bug:
    4-row table with 2 NULL-partition rows compacted to 2 rows)."""
    frag, comp = str(tmp_path / "frag"), str(tmp_path / "comp")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None)], "id long, k string"
    )
    df.repartition(2).write.mode("overwrite").partitionBy("k").parquet(frag)
    before = partition_file_stats(spark, frag, ("k",))
    assert any(s.values == (None,) for s in before)
    report = compact_partitioned_table(
        spark, frag, comp, ("k",), target_file_bytes=1 << 36
    )
    assert report["partitions"] == 2
    after = partition_file_stats(spark, comp, ("k",))
    assert [s.values for s in after] == [s.values for s in before]
    assert _rows(spark, comp) == _rows(spark, frag)  # all 4 rows survive


def test_compact_all_null_single_partition(spark, tmp_path):
    """Single all-NULL partition: name-only plan schema would fail type
    inference; the explicit StructType must carry it through."""
    frag, comp = str(tmp_path / "frag"), str(tmp_path / "comp")
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "id long, k string"
    )
    df.repartition(2).write.mode("overwrite").partitionBy("k").parquet(frag)
    compact_partitioned_table(
        spark, frag, comp, ("k",), target_file_bytes=1 << 36
    )
    assert _rows(spark, comp) == _rows(spark, frag)


def test_compact_escaped_partition_values(spark, tmp_path):
    """Hive %XX-escaped directory names (':' '=' '/' '%') must decode and
    round-trip: every row survives and the layout is preserved."""
    frag, comp = str(tmp_path / "frag"), str(tmp_path / "comp")
    df = spark.createDataFrame(
        [(1, "k:1"), (2, "k=2"), (3, "a/b"), (4, "100%"), (5, "plain")],
        "id long, k string",
    )
    df.repartition(2).write.mode("overwrite").partitionBy("k").parquet(frag)
    before = partition_file_stats(spark, frag, ("k",))
    assert sorted(s.values[0] for s in before) == [
        "100%", "a/b", "k:1", "k=2", "plain",
    ]
    compact_partitioned_table(
        spark, frag, comp, ("k",), target_file_bytes=1 << 36
    )
    after = partition_file_stats(spark, comp, ("k",))
    assert [s.values for s in after] == [s.values for s in before]
    assert _rows(spark, comp) == _rows(spark, frag)


def test_compact_sort_within_clusters_files(spark, tmp_path):
    """sort_within must cluster rows inside every output file (row-group
    skipping restoration) while preserving the row multiset."""
    frag, comp = str(tmp_path / "frag"), str(tmp_path / "comp")
    _fragment_orders(spark, frag)
    compact_partitioned_table(
        spark,
        frag,
        comp,
        ("o_year",),
        target_file_bytes=1 << 36,
        sort_within=("o_orderkey",),
    )
    assert _rows(spark, comp) == _rows(spark, frag)
    out = spark.read.parquet(comp).select(
        F.input_file_name().alias("f"), "o_orderkey"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
    violations = (
        out.withColumn("prev", F.lag("o_orderkey").over(w))
        .where(F.col("prev").isNotNull() & (F.col("prev") > F.col("o_orderkey")))
        .count()
    )
    assert violations == 0
