"""Thread-safe registry for session-lifetime stage persists.

Composition qids (``curation_release``, ``replication_audit``,
``retrieval_release``) and the join-size estimator persist intermediate
stages because Catalyst does not dedupe common subplans — dropping the
persist re-runs the shared stage once per consumer. Those persists must
outlive the call that created them (the returned plan references them),
so they cannot be released inline; before round 10 each site kept its
own module-global list (or nothing at all), which meant unbounded
session-lifetime growth, no synchronization, and concurrent callers
able to release each other's caches.

This module is the shared release hook that closes the class:

- ``track(group, *dfs)`` registers already-persisted DataFrames under a
  named group and returns a :class:`PersistHandle` scoped to exactly
  those DataFrames — the per-call release the ADVICE asked for.
- ``persist_tracked(df, group)`` is the one-liner the composition qids
  use: persist (MEMORY_AND_DISK by default) + track in one step.
- ``release_group(group)`` / ``release_all()`` are the session-hygiene
  sweeps (test teardown, long-lived driver between pipelines).

All mutation happens under one lock; releases are idempotent (a handle
release removes its entries, so a later group sweep cannot
double-unpersist), and unpersist is ``blocking=False`` — eviction is
async and correctness-neutral, an unpersisted table recomputes on next
reference.
"""

from __future__ import annotations

import threading
from typing import TYPE_CHECKING, Dict, List

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_GROUPS: Dict[str, List["DataFrame"]] = {}


def _unpersist(df: "DataFrame") -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session already stopped — nothing left to release


class PersistHandle:
    """Releases exactly the DataFrames one ``track()`` call registered.

    Scoped release: calling :meth:`release` removes this handle's
    entries from the shared registry under the lock, then unpersists
    them — a concurrent ``release_group``/``release_all`` cannot race
    into a double-release, and a second ``release()`` is a no-op.
    """

    __slots__ = ("_group", "_dfs")

    def __init__(self, group: str, dfs: List["DataFrame"]) -> None:
        self._group = group
        self._dfs = dfs

    def release(self) -> int:
        with _LOCK:
            entries = _GROUPS.get(self._group, [])
            mine = [d for d in self._dfs if any(d is e for e in entries)]
            if mine:
                _GROUPS[self._group] = [
                    e for e in entries if not any(e is m for m in mine)
                ]
                if not _GROUPS[self._group]:
                    del _GROUPS[self._group]
            self._dfs = []
        for df in mine:
            _unpersist(df)
        return len(mine)


def track(group: str, *dfs: "DataFrame") -> PersistHandle:
    """Register already-persisted ``dfs`` under ``group``; returns a
    handle that releases exactly these DataFrames."""
    with _LOCK:
        _GROUPS.setdefault(group, []).extend(dfs)
    return PersistHandle(group, list(dfs))


def persist_tracked(
    df: "DataFrame", group: str, level=None, replace: bool = False
) -> "DataFrame":
    """Persist ``df`` (MEMORY_AND_DISK unless ``level`` given) and
    register it under ``group``. The composition-qid idiom: stage
    outputs stay cached for the plan's lifetime but remain releasable
    via ``release_group(group)`` without the qid threading a handle
    back to its caller.

    ``replace=True`` releases whatever the group held BEFORE
    registering the new entry — the bounded idiom for per-call stage
    persists (ADVICE round 10: similarity_lsh / pareto_revenue
    registered a fresh MEMORY_AND_DISK copy per invocation with no
    production release, growing for the session's lifetime). The
    previous call's returned plan merely loses its cache and
    recomputes if re-materialized — correctness-neutral."""
    from pyspark.storagelevel import StorageLevel

    if replace:
        release_group(group)
    out = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    track(group, out)
    return out


def release_group(group: str) -> int:
    """Unpersist everything still registered under ``group``; returns
    how many DataFrames were released."""
    with _LOCK:
        dfs = _GROUPS.pop(group, [])
    for df in dfs:
        _unpersist(df)
    return len(dfs)


def release_all() -> int:
    """Unpersist every registered DataFrame across all groups."""
    with _LOCK:
        dfs = [d for group in _GROUPS.values() for d in group]
        _GROUPS.clear()
    for df in dfs:
        _unpersist(df)
    return len(dfs)


def registered_groups() -> Dict[str, int]:
    """Snapshot of group → live entry count (observability/tests)."""
    with _LOCK:
        return {g: len(v) for g, v in _GROUPS.items()}
