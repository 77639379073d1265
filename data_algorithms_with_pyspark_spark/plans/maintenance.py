"""Table-maintenance catalog queries: the compaction audit.

Proves ``operators/maintenance.compact_partitioned_table`` end-to-end,
cross-engine: deliberately fragment a hive-partitioned copy of orders
(a multi-task write scatters every year's rows across many small files —
the layout a streaming ingester or daily backfill leaves behind), compact
it back to one size-targeted file per partition, and report per-partition
row counts + content digests THAT THE ORACLE COMPUTES FROM THE ORIGINAL
TABLE — identical output proves the rewrite moved every row exactly once.
File-count columns (files_after, had_fragments) come from the real
filesystem listing, so the driver row also attests the compaction did
physically happen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.scratch import scratch_mkdtemp
from data_algorithms_with_pyspark_spark.plans.catalog import register
from data_algorithms_with_pyspark_spark.sources.readers import load_table

__all__ = ["orders_compaction_audit"]

# One (fragmented, compacted) pair per (process, sf_dir); the returned
# DataFrame reads the compacted dir lazily, so both live for the process.
# Keyed on sf_dir + a (size, mtime_ns) fingerprint of orders.parquet so
# in-place regenerated data rebuilds the pair (stale-cache class, r9).
_CACHE: dict[str, tuple[str, str, dict, list]] = {}


def _build(spark: SparkSession, sf_dir: str):
    from data_algorithms_with_pyspark_spark.sources.readers import (
        table_fingerprint,
    )

    key = f"{sf_dir}|{table_fingerprint(sf_dir, 'orders')}"
    cached = _CACHE.get(key)
    if cached is not None and os.path.isdir(cached[1]):
        return cached
    from data_algorithms_with_pyspark_spark.operators.maintenance import (
        compact_partitioned_table,
        partition_file_stats,
    )

    frag = scratch_mkdtemp(prefix="orders_fragmented_")
    comp = scratch_mkdtemp(prefix="orders_compacted_")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    # 8 hash-scattered tasks x partitionBy => every year lands in ~8
    # small files: the accreted-small-files layout under maintenance.
    orders.repartition(8, F.col("o_orderkey")).write.mode(
        "overwrite"
    ).partitionBy("o_year").parquet(frag)
    report = compact_partitioned_table(
        spark,
        frag,
        comp,
        partition_cols=("o_year",),
        # far above any sf's per-year bytes -> exactly 1 file/partition
        target_file_bytes=1 << 36,
    )
    before = {
        s.values[0]: s.n_files
        for s in partition_file_stats(spark, frag, ("o_year",))
    }
    after = partition_file_stats(spark, comp, ("o_year",))
    per_year = [
        (int(s.values[0]), before[s.values[0]], s.n_files) for s in after
    ]
    _CACHE[key] = (frag, comp, report, per_year)
    return _CACHE[key]


@register(
    "orders_compaction_audit",
    tags=("maintenance", "io", "audit"),
    description="Small-file compaction audit: fragment orders into ~8 "
    "files per year-partition, compact to 1 size-targeted file per "
    "partition (operators/maintenance.py), then prove row identity per "
    "partition against the ORIGINAL table (count + key/price digests "
    "replayed by the oracle) and physical success from the real file "
    "listing (files_after=1, had_fragments=1)",
    oracle="""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               count(*) AS n_rows,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS price_sum,
               CAST(1 AS BIGINT) AS files_after,
               CAST(1 AS BIGINT) AS had_fragments
        FROM orders
        GROUP BY 1
    """,
)
def orders_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The digest columns are computed from the COMPACTED files and the
    oracle recomputes them from the pristine orders table — equality is
    the row-identity proof (sum digests are order/partitioning
    independent). files_after/had_fragments join in from the driver-side
    filesystem listings (bounded: one row per partition)."""
    _frag, comp, _report, per_year = _build(spark, sf_dir)
    compacted = spark.read.parquet(comp)
    agg = compacted.groupBy(F.col("o_year").cast("long").alias("o_year")).agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            / 100.0
        ).alias("price_sum"),
    )
    stats = spark.createDataFrame(
        [
            (y, after_n, 1 if before_n > after_n else 0)
            for (y, before_n, after_n) in per_year
        ],
        schema="o_year long, files_after long, had_fragments long",
    )
    return agg.join(F.broadcast(stats), on="o_year", how="inner")


_BJOIN_BUCKETS = 16


@register(
    "bucketed_orders_lineitem_join",
    tags=("maintenance", "io", "join", "bucketing"),
    description="Co-located FACT-FACT join: orders and lineitem are both "
    f"persisted bucketBy({_BJOIN_BUCKETS}, orderkey) sortBy(orderkey) "
    "(pay the shuffle ONCE at write), then the revenue-per-priority "
    "report joins them with ZERO Exchange on either side (the residual "
    "within-bucket Sort is local — SPARK-28595 hides scan ordering "
    "without a legacy conf, and catalog queries take no session confs) — "
    "the 100 TB repeated-join layout broadcast can't reach (both sides "
    "fact-sized); revenue in exact integer cents so the digest is "
    "accumulation-order-free; plan shape pinned by "
    "tests/test_plans_physical.py",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                   + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def bucketed_orders_lineitem_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Both fact tables land as bucketed+sorted catalog tables at most
    once per (process, corpus fingerprint) — the same pay-once contract
    as the persisted ANN index and the incremental band index — and the
    join itself plans as SortMergeJoin over two bucketed scans with no
    Exchange on either side: at 100 TB neither fact ever shuffles again,
    for THIS and every future orderkey-keyed join. Per-row floor to
    integer cents keeps the revenue digest exact under any accumulation
    order (the established cross-engine sum recipe)."""
    from data_algorithms_with_pyspark_spark.sources.readers import (
        table_fingerprint,
    )
    from data_algorithms_with_pyspark_spark.sources.writers import (
        write_bucketed_table,
    )

    fp = table_fingerprint(sf_dir, "orders")
    t_orders = f"bkt_orders_{fp}"
    t_lineitem = f"bkt_lineitem_{fp}"
    # repartition on the bucket key BEFORE the bucketed write: bucketBy
    # and repartition share Murmur3 hash partitioning, so each task owns
    # exactly one bucket and writes exactly one file — the precondition
    # for the scan to report its sortBy ordering (Spark trusts write-time
    # sort only at one-file-per-bucket; multi-file buckets would re-Sort
    # above each scan at every future join).
    if not spark.catalog.tableExists(t_orders):
        write_bucketed_table(
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .repartition(_BJOIN_BUCKETS, F.col("o_orderkey")),
            t_orders,
            ("o_orderkey",),
            _BJOIN_BUCKETS,
            sort_cols=("o_orderkey",),
        )
    if not spark.catalog.tableExists(t_lineitem):
        write_bucketed_table(
            load_table(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey",
                F.floor(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * 100
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("rev_cents"),
            )
            .repartition(_BJOIN_BUCKETS, F.col("l_orderkey")),
            t_lineitem,
            ("l_orderkey",),
            _BJOIN_BUCKETS,
            sort_cols=("l_orderkey",),
        )
    orders = spark.table(t_orders)
    lineitem = spark.table(t_lineitem)
    joined = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"]
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count("*").cast("long").alias("n_lines"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


# One evolved-layout dir per (process, orders fingerprint) — the same
# pay-once cache contract as the compaction pair above.
_EVOLVE_CACHE: dict[str, str] = {}


def _build_evolved(spark: SparkSession, sf_dir: str) -> str:
    from data_algorithms_with_pyspark_spark.sources.readers import (
        table_fingerprint,
    )

    key = f"{sf_dir}|{table_fingerprint(sf_dir, 'orders')}"
    cached = _EVOLVE_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    out = scratch_mkdtemp(prefix="orders_evolved_")
    orders = load_table(spark, sf_dir, "orders")
    # Day-1 ingest: the original schema (no cents column).
    orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderpriority"
    ).write.mode("append").parquet(out)
    # Day-2 ingest: the pipeline started emitting an extra column. Old
    # files are never rewritten — the new column simply appears in new
    # files, the normal way schemas drift under continuous ingest.
    orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("o_price_cents"),
    ).write.mode("append").parquet(out)
    _EVOLVE_CACHE[key] = out
    return out


@register(
    "orders_schema_evolution_read",
    tags=("maintenance", "io", "sources"),
    description="Schema-drift read: day-1 parquet files lack a column "
    "that day-2 ingest batches added; mergeSchema=true reconciles the "
    "footers so one scan serves both generations (old rows read NULL), "
    "and the report proves no row and no new-column value was dropped — "
    "the continuous-ingest contract at 100 TB, where rewriting old "
    "files on every schema change is not an option",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_evolved,
               CAST(sum(CASE WHEN o_orderkey % 2 = 1
                             THEN CAST(floor(o_totalprice * 100 + 0.5)
                                       AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS price_cents_evolved
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def orders_schema_evolution_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Without mergeSchema a parquet read takes ONE file's footer as the
    schema — whichever generation it samples — silently hiding the new
    column (or failing) for mixed layouts; with it, Spark unions the
    footers and back-fills NULL for pre-drift files. The oracle
    recomputes the same report from the pristine orders table, so
    equality proves the evolved read lost nothing on either side of the
    drift boundary. count() of the new column doubles as the NULL
    back-fill check (it must equal the day-2 row count exactly)."""
    evolved = _build_evolved(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(evolved)
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count("o_price_cents").cast("long").alias("n_evolved"),
            F.coalesce(F.sum("o_price_cents"), F.lit(0))
            .cast("long")
            .alias("price_cents_evolved"),
        )
        .orderBy("o_orderpriority")
    )
