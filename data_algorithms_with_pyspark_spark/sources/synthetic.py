"""Synthetic-table Python DataSource (Spark 4 ``pyspark.sql.datasource``).

Solves the 100 TB test-data problem: correctness fixtures live in parquet,
but scale/soak testing needs arbitrarily large inputs WITHOUT writing
files first. This registers a native Spark data source —

    spark.dataSource.register(SyntheticEventsSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 10_000_000).option("partitions", 256).load())

— that generates the events-table shape deterministically: row ``i`` is a
pure function of ``(seed, i)``, independent of partitioning, so ANY two
reads (any cluster size, any partition count) produce the same multiset —
the same partition-independence contract as the engine's hash sampling.

Scale shape: ``partitions()`` splits the row range into contiguous
half-open slices; each task generates ONLY its slice (no driver
materialization, no shuffle, no files). Generation cost is a tight
per-row splitmix64 — the standard counter-based PRNG trick, so there is
no sequential RNG state to carry across rows or partitions.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = ["SyntheticEventsSource", "register_synthetic_source"]

_MASK64 = (1 << 64) - 1
_EVENT_TYPES = ("signup", "view", "click", "purchase", "refund")


def _splitmix64(x: int) -> int:
    """Counter-based PRNG step: deterministic 64-bit mix of the counter."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", max(1, self.rows // 20)))

    def partitions(self):
        if self.rows <= 0:
            # empty relation, not a crash: step would be 0 and
            # range(0, 0, 0) raises
            return [_Slice(0, 0, self.seed)]
        n = max(1, min(self.n_parts, self.rows))
        step = (self.rows + n - 1) // n
        return [
            _Slice(lo, min(lo + step, self.rows), self.seed)
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Slice):
        base = partition.seed << 32
        for i in range(partition.start, partition.end):
            h = _splitmix64(base + i)
            user_id = h % self.n_users
            etype = _EVENT_TYPES[(h >> 17) % len(_EVENT_TYPES)]
            # microsecond timestamps over ~30 days from a fixed epoch
            ts_us = 1_700_000_000_000_000 + (h >> 3) % (30 * 86_400_000_000)
            value = ((h >> 7) % 1_000_000) / 100.0  # exact cents
            yield (i, ts_us, user_id, etype, value)


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched form of the same deterministic generator: the offset
    IS the row counter, so each batch is the contiguous id slice
    [start, start + rows_per_batch) and replaying any offset range
    regenerates identical rows — exactly-once semantics for free, with no
    files and no state beyond one integer."""

    def __init__(self, options):
        self.per_batch = int(options.get("rowsPerBatch", 100))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", 50))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = lo + self.per_batch
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["next"]), int(end["next"]))

    def _rows(self, lo: int, hi: int):
        # a LIST, not a generator: the simple stream reader prefetches and
        # pickles the batch driver-side (generators are not picklable)
        base = self.seed << 32
        out = []
        for i in range(lo, hi):
            h = _splitmix64(base + i)
            user_id = h % self.n_users
            etype = _EVENT_TYPES[(h >> 17) % len(_EVENT_TYPES)]
            ts_us = 1_700_000_000_000_000 + (h >> 3) % (30 * 86_400_000_000)
            value = ((h >> 7) % 1_000_000) / 100.0
            out.append((i, ts_us, user_id, etype, value))
        return out


class SyntheticEventsSource(DataSource):
    """``format("synthetic_events")`` — batch options: rows, partitions,
    seed, users; streaming options: rowsPerBatch, seed, users."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts_us bigint, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsSource)
