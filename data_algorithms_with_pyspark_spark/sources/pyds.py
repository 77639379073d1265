"""Spark 4 Python DataSource API source (north-star extension).

The reference's DNA chapter reads FASTA line-wise and filters headers
(``dna_base_count_ver_1.py:75-82``) — workable for per-base counts, but
a *record* view of FASTA (header + its wrapped sequence lines) cannot be
produced by a line scan at all: a record spans a variable number of
lines. Spark 4's Python DataSource API (SPARK-44076) is the idiomatic
extension point for exactly this gap, and this module implements it the
way a 100 TB deployment would:

* **Planning is driver-side and O(#files)**: ``partitions()`` lists the
  directory and emits one ``InputPartition`` per file — records never
  span files (each file is written whole), so record assembly needs no
  cross-partition stitching and parallelism scales with the file count
  like any splittable source.
* **Record assembly is per-partition streaming state**: one pass, one
  open record buffer — the same (header, [lines]) fold regardless of
  file size.
* **Rows cross to the JVM as Arrow RecordBatches** (SPARK-48493), not
  pickled Python rows — the batch path that keeps a Python-defined
  source off the row-at-a-time slow path.

The classes are intentionally tiny and stateless (options -> paths ->
batches); everything downstream of ``load()`` is ordinary Catalyst.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

__all__ = [
    "FastaDataSource",
    "register_fasta_source",
    "EventsReplayDataSource",
    "register_events_replay_source",
]

_BATCH_ROWS = 4096


class _FastaFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class _FastaReader(DataSourceReader):
    """One InputPartition per FASTA file; streaming record assembly."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("fasta source requires a 'path' option")
        self._path = path

    def partitions(self) -> list[InputPartition]:  # driver-side, O(#files)
        p = self._path
        if os.path.isfile(p):
            return [_FastaFilePartition(p)]
        # Committed-files-only read: the sink's commit() writes a
        # _SUCCESS manifest naming exactly the files whose tasks
        # returned a commit message. A failed or speculative task
        # attempt never reaches commit (so abort() cannot know its
        # file); a directory listing would silently include its
        # partial/duplicate output. A NON-EMPTY manifest — not the
        # listing — is therefore the source of truth; an empty one is
        # Hadoop's zero-byte marker convention (plain .text() writes),
        # where the listing remains the only record of what committed.
        manifest = os.path.join(p, "_SUCCESS")
        if os.path.isfile(manifest):
            with open(manifest, encoding="utf-8") as fh:
                names = [ln.strip() for ln in fh if ln.strip()]
            if names:
                return [
                    _FastaFilePartition(os.path.join(p, f))
                    for f in sorted(names)
                ]
        files = sorted(
            os.path.join(p, f)
            for f in os.listdir(p)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        if not files:
            raise FileNotFoundError(f"no part- files under {p!r}")
        return [_FastaFilePartition(f) for f in files]

    def read(self, partition: _FastaFilePartition):
        import pyarrow as pa

        headers: list[str] = []
        seqs: list[str] = []

        def flush_batch():
            batch = pa.RecordBatch.from_arrays(
                [pa.array(headers, pa.string()), pa.array(seqs, pa.string())],
                names=["header", "sequence"],
            )
            headers.clear()
            seqs.clear()
            return batch

        cur_header: str | None = None
        cur_lines: list[str] = []
        with open(partition.path, encoding="utf-8") as fh:
            for raw in fh:
                line = raw.rstrip("\n").rstrip("\r")
                if not line:
                    continue  # blank lines are legal between records
                if line.startswith(">"):
                    if cur_header is not None:
                        headers.append(cur_header)
                        seqs.append("".join(cur_lines))
                        if len(headers) >= _BATCH_ROWS:
                            yield flush_batch()
                    cur_header = line[1:]
                    cur_lines = []
                elif cur_header is not None:
                    cur_lines.append(line)
                # sequence lines before any header are malformed; skipped
        if cur_header is not None:
            headers.append(cur_header)
            seqs.append("".join(cur_lines))
        if headers:
            yield flush_batch()


@dataclass
class _FastaCommitMessage(WriterCommitMessage):
    file: str
    n_records: int


class _FastaArrowWriter(DataSourceArrowWriter):
    """One FASTA file per partition, written from Arrow batches; the
    standard two-phase protocol: tasks emit commit messages naming their
    file, the driver's ``commit()`` finalizes — it writes a ``_SUCCESS``
    manifest naming exactly the committed files (the reader trusts the
    manifest over the directory listing) and sweeps every other part-*
    file, which covers both overwrite-superseded files AND orphans from
    failed/speculative attempts that never returned a commit message
    (``abort()`` cannot know their names). In append mode the prior
    manifest's files are retained and merged into the new manifest.
    Assumes driver and executors share one filesystem (true in local
    mode and on any shared-POSIX deployment; an object-store deployment
    would stage to task-temp paths and rename in commit — same protocol,
    different rename)."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("fasta sink requires a 'path' option")
        self._path = path
        self._wrap = int(options.get("wrap", "60"))
        if self._wrap <= 0:
            raise ValueError("fasta sink 'wrap' must be positive")
        os.makedirs(path, exist_ok=True)
        # Files committed by PRIOR writes, retained under append mode.
        # Prefer the manifest (committed-only truth); fall back to the
        # listing for directories produced by other writers.
        self._keep: set[str] = set()
        if not overwrite:
            manifest = os.path.join(path, "_SUCCESS")
            if os.path.isfile(manifest):
                with open(manifest, encoding="utf-8") as fh:
                    self._keep = {ln.strip() for ln in fh if ln.strip()}
            else:
                self._keep = {
                    f for f in os.listdir(path) if f.startswith("part-")
                }

    def write(self, iterator) -> _FastaCommitMessage:
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.fasta"
        n = 0
        with open(
            os.path.join(self._path, fname), "w", encoding="utf-8"
        ) as fh:
            for batch in iterator:
                d = batch.to_pydict()
                for h, s in zip(d["header"], d["sequence"]):
                    fh.write(">" + (h or "") + "\n")
                    s = s or ""
                    for i in range(0, len(s), self._wrap):
                        fh.write(s[i : i + self._wrap] + "\n")
                    n += 1
        return _FastaCommitMessage(file=fname, n_records=n)

    def commit(self, messages) -> None:
        # Finalize = keep exactly the committed files: this write's
        # commit messages plus (append mode) the prior manifest's files.
        # Sweeping EVERY other part-* reclaims both overwrite-superseded
        # files and orphans from failed/speculative attempts that never
        # produced a message — abort() cannot know their names, and the
        # reader's manifest rule already excludes them from read-back;
        # this removes the bytes.
        keep = {m.file for m in messages if m is not None} | self._keep
        for f in os.listdir(self._path):
            if f.startswith("part-") and f not in keep:
                try:
                    os.remove(os.path.join(self._path, f))
                except FileNotFoundError:
                    pass
        with open(
            os.path.join(self._path, "_SUCCESS"), "w", encoding="utf-8"
        ) as fh:
            fh.write("\n".join(sorted(keep)) + "\n")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self._path, m.file))
                except FileNotFoundError:
                    pass


class FastaDataSource(DataSource):
    """``spark.read.format("fasta").option("path", dir).load()`` ->
    ``(header string, sequence string)`` — one row per FASTA record,
    multi-line sequences reassembled. The matching sink
    (``df.write.format("fasta").option("path", dir).mode("overwrite")
    .save()``) wraps sequences at ``wrap`` chars (default 60), one file
    per partition, two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "fasta"

    def schema(self) -> str:
        return "header string, sequence string"

    def reader(self, schema) -> DataSourceReader:
        return _FastaReader(self.options)

    def writer(self, schema, overwrite: bool) -> _FastaArrowWriter:
        names = [f.name for f in schema.fields]
        if names != ["header", "sequence"]:
            raise ValueError(
                "fasta sink expects exactly (header, sequence) columns, "
                f"got {names}"
            )
        return _FastaArrowWriter(self.options, overwrite)


def register_fasta_source(spark) -> None:
    """Idempotently register the FASTA source on a session (re-register
    is a cheap overwrite; catalog queries must work on HOSTILE sessions
    that did not pre-register anything)."""
    spark.dataSource.register(FastaDataSource)


# --- custom STREAMING source: chunked replay --------------------------------


class _ChunkPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class _EventsReplayStreamReader(DataSourceStreamReader):
    """Micro-batch replay of pre-chunked parquet files, at most ``step``
    chunks admitted per trigger.

    The scale-honest HALF of the Python streaming-source API: offsets
    ({"chunk": k} = chunks consumed) and admission control live on the
    driver, but each admitted chunk becomes an ``InputPartition`` whose
    ``read()`` runs ON EXECUTORS and yields Arrow batches — the
    partition-planned :class:`DataSourceStreamReader`, not the
    driver-reading Simple variant, so read throughput scales with the
    cluster exactly like the built-in file source."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("events_replay requires a 'path' option")
        self._files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        if not self._files:
            raise FileNotFoundError(f"no part- chunks under {path!r}")
        self._n = len(self._files)
        self._step = int(options.get("step", "1"))
        if self._step <= 0:
            raise ValueError("events_replay 'step' must be positive")
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"chunk": 0}

    def latestOffset(self) -> dict:
        self._pos = min(self._pos + self._step, self._n)
        return {"chunk": self._pos}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["chunk"]), int(end["chunk"])
        # Offsets are durable (checkpoint log); this reader's admission
        # state (_pos) is not — a restart builds a FRESH reader at
        # _pos=0 and then hands back offsets from the log. Every
        # engine-handed offset therefore FLOORS _pos (both ends: after a
        # committed-batch restart the engine's start exceeds anything a
        # fresh reader has admitted, and without the lo clamp the next
        # latestOffset would go backward — the offset log would regress
        # and later forward batches would re-serve committed chunks as
        # duplicates). A backward range (hi < lo) can only be a plan the
        # engine made against a stale latestOffset; serve it as empty.
        self._pos = max(self._pos, lo, hi)
        return [_ChunkPartition(self._files[i]) for i in range(lo, hi)]

    def read(self, partition: _ChunkPartition):
        import pyarrow.parquet as pq

        t = pq.read_table(
            partition.path, columns=["user_id", "event_type", "value"]
        )
        yield from t.to_batches()

    def commit(self, end: dict) -> None:
        # Chunks are immutable — nothing to release — but the committed
        # offset must still floor the admission cursor: on a restart
        # where the last batch WAS committed, the engine may replay
        # commit(end) to a fresh reader whose _pos is 0, and without
        # this clamp latestOffset would return an offset BELOW the
        # committed one (backward batch, then duplicate re-admission of
        # committed chunks — duplicates folded into restored state).
        self._pos = max(self._pos, int(end["chunk"]))


class EventsReplayDataSource(DataSource):
    """``spark.readStream.format("events_replay").option("path", dir)
    .load()`` -> micro-batch replay of chunked parquet, ``step`` chunks
    per trigger."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return "user_id bigint, event_type string, value double"

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _EventsReplayStreamReader(self.options)


def register_events_replay_source(spark) -> None:
    """Idempotent per-session registration (hostile-session rule)."""
    spark.dataSource.register(EventsReplayDataSource)
