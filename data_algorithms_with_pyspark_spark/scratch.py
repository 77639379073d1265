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
import re
import shutil
import tempfile

__all__ = ["scratch_dir", "scratch_mkdtemp", "sweep_orphans"]

_CREATED: set[str] = set()

# Every scratch path embeds the owning PID so a LATER process can tell a
# live run's scratch from a crashed one's: scratch_dir ends in `_{pid}`,
# scratch_mkdtemp embeds `pid-{pid}_` before mkdtemp's random suffix.
_MKDTEMP_PID_RE = re.compile(r"pid-(\d+)_")
_SUFFIX_PID_RE = re.compile(r"_(\d+)$")


def _cleanup() -> None:
    for p in _CREATED:
        shutil.rmtree(p, ignore_errors=True)


atexit.register(_cleanup)


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except OSError:
        # PermissionError etc.: the PID exists but isn't ours.
        return True
    return True


def sweep_orphans(tmp: str | None = None) -> list[str]:
    """Remove spark_graft_* scratch dirs whose owning process is gone.

    atexit never runs on SIGKILL/OOM, and because paths are PID-keyed a
    later run (different PID) would never overwrite a crashed run's
    leak — repeated crashes accumulate unbounded /tmp usage. Run
    opportunistically at import: any dir whose embedded PID no longer
    exists is dead by construction (its atexit can never fire).
    Returns the removed paths (for tests)."""
    tmp = tmp or tempfile.gettempdir()
    try:
        names = os.listdir(tmp)
    except OSError:
        return []
    removed: list[str] = []
    for name in names:
        if not name.startswith("spark_graft_"):
            continue
        m = _MKDTEMP_PID_RE.search(name) or _SUFFIX_PID_RE.search(name)
        if not m:
            continue
        pid = int(m.group(1))
        if pid == os.getpid() or _pid_alive(pid):
            continue
        path = os.path.join(tmp, name)
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


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
    compaction before/after trees) rather than a per-process stable one.
    The name embeds the spark_graft marker + owning PID so
    :func:`sweep_orphans` can reclaim it after a crashed run."""
    path = tempfile.mkdtemp(
        prefix=f"spark_graft_{prefix}pid-{os.getpid()}_"
    )
    _CREATED.add(path)
    return path


sweep_orphans()
