"""Process-scoped scratch directories for roundtrip/streaming rows.

Several catalog rows attest write->read roundtrips (FASTA, ORC, XML,
the observed-pass parquet write) or stage streaming sources/sinks.
Two hygiene rules, both enforced here:

* **No cross-process collisions.** The roundtrip rows used to write to
  a fixed /tmp path keyed only by the SF-dir basename, so two
  concurrent runs at the same SF raced on ``mode("overwrite")`` —
  observed as a rare read-after-clobber flake. :func:`scratch_dir`
  keys the path by PID: stable WITHIN a process (re-running a row
  overwrites its own scratch, which ``mode("overwrite")`` handles),
  disjoint ACROSS processes.
* **No leaks.** Every path handed out is removed at interpreter exit.
  Cleanup cannot happen inline for most rows: they return LAZY
  DataFrames that read the scratch files only when the caller acts on
  them, after the query function has returned. (Rows whose write is
  eager and whose result is driver-side — e.g. the Observation row —
  additionally clean up inline themselves.)
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

__all__ = ["scratch_dir", "scratch_mkdtemp"]

_CREATED: set[str] = set()


def _cleanup() -> None:
    for p in _CREATED:
        shutil.rmtree(p, ignore_errors=True)


atexit.register(_cleanup)


def scratch_dir(prefix: str, sf_dir: str) -> str:
    """Per-process scratch path for ``prefix`` at this SF dir, removed at
    process exit. The directory itself is NOT created (Spark writers
    create their own output dirs)."""
    name = (
        f"spark_graft_{prefix}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}"
    )
    path = os.path.join(tempfile.gettempdir(), name)
    _CREATED.add(path)
    return path


def scratch_mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is swept at process exit — for staging
    dirs that need a FRESH directory per call (streaming checkpoints,
    compaction before/after trees) rather than a per-process stable one."""
    path = tempfile.mkdtemp(prefix=prefix)
    _CREATED.add(path)
    return path
