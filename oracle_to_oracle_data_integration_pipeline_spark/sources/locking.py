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
from collections.abc import Iterator


@contextlib.contextmanager
def table_write_lock(table_path: str) -> Iterator[None]:
    """Block until this process holds the exclusive advisory lock for
    ``table_path``. Guards the rename-swap window across processes on
    the same host (the local-mode deployment unit); multi-host writers
    need a coordination service or a table format instead.
    """
    lock_path = table_path.rstrip("/") + ".lock"
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
