"""Advisory per-table file locks for local-filesystem table swaps.

POSIX ``rename`` gives atomic single-path swaps, but a table swap here
is two renames (live → old, tmp → live): a concurrent WRITER in that
window can append into a directory that is about to be rmtree'd —
silent data loss. The swap therefore requires single-writer semantics,
enforced with ``flock`` on a ``<table>.lock`` sibling shared by every
mutating entry point (merge overwrite, compact).

Readers are deliberately NOT locked: a reader between the two renames
can observe a briefly missing directory (ENOENT) and should retry.
Truly atomic directory exchange needs renameat2(RENAME_EXCHANGE) or a
manifest/view indirection — on a real deployment this layer is a table
format (Delta/Iceberg) whose metadata commit provides it.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import threading
from collections.abc import Iterator

# Per-thread reentrancy: CdcPipeline.replicate_table holds the table
# lock across its whole read→merge→swap and ParquetTargetStore.overwrite
# re-acquires inside it. flock is per open-file-description, so a naive
# second acquisition in the same thread would self-deadlock; a counter
# keyed by (thread, lock path) makes the inner acquisition a no-op while
# different threads (the pipeline's per-table ThreadPoolExecutor) still
# exclude each other through the kernel lock.
_held = threading.local()


@contextlib.contextmanager
def table_write_lock(table_path: str) -> Iterator[None]:
    """Block until this thread holds the exclusive advisory lock for
    ``table_path`` (reentrant within a thread). Guards the whole
    read→compute→rename-swap critical section across processes on the
    same host (the local-mode deployment unit); multi-host writers need
    a coordination service or a table format instead.
    """
    lock_path = table_path.rstrip("/") + ".lock"
    held: dict[str, list] = getattr(_held, "m", None) or {}
    _held.m = held
    if lock_path in held:
        held[lock_path][1] += 1
        try:
            yield
        finally:
            held[lock_path][1] -= 1
        return
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        held[lock_path] = [fd, 1]
        try:
            yield
        finally:
            del held[lock_path]
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
