"""Readers: the engine's scan surface (SURVEY.md §2.1, S1-S9).

Covers the reference's source formats as idiomatic Spark reads:

* CSV with header+inference (``physical_partitioning.py:45``), headerless
  ``_c0..`` naming (``csv_json_operations.py:58-64``), and explicit
  StructType (``csv_json_operations.py:68-84``) — the three schema modes.
* Line-delimited JSON with nested inference (``etl_census_dataframe.py:26-28``).
* Parquet with embedded schema + partition discovery
  (``parquet_operations.py:61-63``, ``physical_partitioning.py:93``).
* Line-oriented text (``dna_base_count_ver_1.py:75`` — FASTA etc.).

The reference's driver-side NamedTuple CSV loader
(``src/common/data_loader.py:20-65``) is intentionally not ported: it only
exists because its examples are tiny. ``spark.read`` scales instead.

All readers return lazy DataFrames — Catalyst pushes filters/projections into
the scan (``PushedFilters`` / ``ReadSchema`` in .explain), which is what makes
them viable at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_algorithms_with_pyspark_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS

__all__ = [
    "ensure_session_confs",
    "table_fingerprint",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_orc",
    "read_text",
    "read_binary_files",
    "load_table",
    "load_tables",
    "register_views",
]

# Runtime-settable confs the catalog's CORRECTNESS depends on. The engine's
# own factory (session.py:get_spark) sets these at build time, but callers may
# hand the catalog ANY SparkSession — an external harness builds its own — so
# every load_table re-asserts them on the live session:
#
# * nanosAsLong: events.parquet stores ts as parquet TIMESTAMP(NANOS), which
#   Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL) unless surfaced
#   as a ns-long (load_table then converts to a microsecond timestamp).
# * timeZone=UTC: date_trunc/dayofweek/window results are compared against
#   naive-UTC oracle timestamps; a session in any other zone shifts them.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin runtime-settable confs that query correctness depends on.

    Idempotent and cheap (conf.get is a local lookup); called from
    ``load_table`` so the engine behaves identically under any caller's
    SparkSession, not just ``session.get_spark``'s.
    """
    for key, value in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # Conf not settable in this Spark build: leave it; the events
            # reader will surface a clear error if the capability is needed.
            pass


def table_fingerprint(sf_dir: str, table: str) -> str:
    """Content fingerprint for per-(process, sf_dir) cached artifacts built
    from one testdata table (the persisted ANN index, the rewritten
    streaming source files): path PLUS a (size, mtime_ns) signature of the
    table's parquet file(s), so data regenerated in place — even with
    byte-identical sizes, plausible for a fixed-schema deterministic
    generator — invalidates the cache instead of silently serving stale
    derived state (ADVICE r8: mtime was missing from the directory branch,
    and _FLUSHED_SRC_CACHE keyed on the bare path). O(1) driver-side stat
    per part file — never a data scan."""
    import hashlib
    import sys

    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(p):
            parts = sorted(
                e for e in os.listdir(p) if not e.startswith((".", "_"))
            )
            stats = ",".join(
                f"{st.st_size}:{st.st_mtime_ns}"
                for st in (os.stat(os.path.join(p, e)) for e in parts)
            )
            sig = f"{p}|{len(parts)}|{stats}"
        else:
            st = os.stat(p)
            sig = f"{p}|{st.st_size}|{st.st_mtime_ns}"
    except OSError as exc:
        # Path-only keying can serve stale state if the data later appears
        # with the same path; make the degraded mode visible.
        print(
            f"table_fingerprint: stat failed for {p} ({exc}); "
            "falling back to path-only cache key",
            file=sys.stderr,
        )
        sig = p
    return hashlib.md5(sig.encode()).hexdigest()[:8]


_ROW_COUNT_CACHE: dict[str, int] = {}


def parquet_row_count(sf_dir: str, table: str) -> int:
    """Exact row count of a testdata table from parquet FOOTERS only —
    the cheap corpus-size estimate the LSH planners need
    (``choose_lsh_params`` docstring: "a parquet-metadata count()").
    Unlike ``df.count()`` this never launches a Spark job: it reads each
    part file's footer metadata driver-side (pyarrow), O(part files)
    stat+footer reads. Cached per content fingerprint so repeated
    planner calls in one process cost nothing, while in-place data
    regeneration invalidates (same contract as table_fingerprint)."""
    import pyarrow.parquet as pq

    key = table_fingerprint(sf_dir, table)
    if key in _ROW_COUNT_CACHE:
        return _ROW_COUNT_CACHE[key]
    p = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(p):
        files = sorted(
            os.path.join(p, e)
            for e in os.listdir(p)
            if e.endswith(".parquet") and not e.startswith((".", "_"))
        )
    else:
        files = [p]
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    _ROW_COUNT_CACHE[key] = n
    return n


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer_schema: bool | None = None,
    sep: str = ",",
) -> DataFrame:
    """CSV scan in any of the three schema modes.

    * ``schema`` given → explicit StructType, no inference scan (production).
    * ``schema=None, infer_schema=True`` → two-pass inference.
    * ``schema=None, infer_schema=False`` → all-string columns; headerless
      files get Spark's default ``_c0, _c1, ...`` names.
    """
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        if infer_schema is None:
            infer_schema = True
        reader = reader.option("inferSchema", str(infer_schema).lower())
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    mode: str = "PERMISSIVE",
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """Line-delimited JSON; nested arrays/structs infer unless schema given.

    Malformed-row policy (production ETL concern the teaching reference
    skips): PERMISSIVE (default) nulls bad rows — pass
    ``corrupt_record_col`` (and include it in ``schema``) to quarantine
    the raw text of each bad line instead of dropping it silently;
    DROPMALFORMED discards them; FAILFAST raises on the first bad line.
    """
    reader = spark.read.option("mode", mode)
    if corrupt_record_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_record_col)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Parquet scan: embedded schema, column pruning, predicate pushdown,
    hive-style partition discovery (``year=.../month=...`` dirs -> columns).

    ``merge_schema=True`` reconciles files written with evolving schemas
    (added nullable columns) into their union — an extra footer-reading
    pass at planning time, so off by default and only for tables that
    actually evolved."""
    return spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — like parquet, self-describing columnar with predicate
    pushdown / column pruning via the vectorized ORC reader."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented scan -> DataFrame[value: string]."""
    return spark.read.text(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Whole-file binary scan -> (path, modificationTime, length, content).

    Spark's ``binaryFile`` source: one row per file with the raw bytes in
    ``content`` — the ingestion point for the multimodal pipeline
    (operators/multimodal.py decodes ``content`` exactly like its
    synthetic ``data`` column). Pushdown applies to the METADATA columns
    (a filter on ``length``/``path`` prunes files before any bytes are
    read); the content column itself is whole-file, so cap file size per
    task via ``spark.sql.files.maxPartitionBytes``-sized media shards at
    ingest time rather than scanning multi-GB blobs into single rows."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one engine table from a testdata scale-factor directory.

    Parquet carries its own schema; we still validate the name so typos fail
    fast, and keep the expected schema available in ``TABLE_SCHEMAS``.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # events.ts as parquet TIMESTAMP(NANOS): surfaced as a ns-long
            # via spark.sql.legacy.parquet.nanosAsLong (session.py),
            # converted here to a microsecond timestamp (truncation —
            # matches engines that narrow ns to us).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # events.ts as parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
            # reads as TIMESTAMP_NTZ. The catalog computes on session-time
            # TIMESTAMP (unix_micros/window/interval arithmetic); with the
            # session pinned to UTC (ensure_session_confs) this cast is
            # wall-clock-identical to the oracle's naive reading.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLE_NAMES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> None:
    """Register every table as a temp view so ``spark.sql`` works against it
    (the reference's SQL entry point, ``csv_json_operations.py:198-202``)."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
