"""Multi-PROCESS contention hammer for the advisory table lock and the
snapshot commit protocol (VERDICT r5 ask #8).

`tests/test_snapshot_store.py::test_concurrent_commits_serialize` pins
the multi-THREAD case, but flock is a kernel lock whose whole point is
cross-process exclusion — and the reentrancy bookkeeping in
`sources/locking.py` is thread-local, so only a real process race
exercises the pure-flock path. Each worker process runs the REAL
`SnapshotStore.commit` (lock → read latest → write data → manifest
tmp+replace → pointer tmp+replace) with the DataFrame write step
duck-typed to a marker file, so no per-process SparkSession is needed
and the protocol under test is byte-identical to production.

Pass criterion: N processes × M commits each yield exactly N*M DENSE
versions (no lost update, no duplicate, no gap), every manifest intact
with a correct parent chain, every data directory present with exactly
one writer's marker, and no stray temp files.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROCS = 6
N_COMMITS = 8

_WORKER = r"""
import os, sys

from oracle_to_oracle_data_integration_pipeline_spark.sources.snapshots import SnapshotStore


class _MarkerDF:
    '''Duck-typed stand-in for DataFrame.write.mode(...).parquet(path):
    writes a marker file so the test can attribute each version to the
    (worker, iteration) that committed it. Everything else in
    _commit_locked — lock, version read, manifest, pointer swap — runs
    the real code.'''

    def __init__(self, payload):
        self.payload = payload

    @property
    def write(self):
        return self

    def mode(self, m):
        assert m == "errorifexists"
        return self

    def parquet(self, path):
        os.makedirs(path, exist_ok=False)
        with open(os.path.join(path, "marker.txt"), "w") as f:
            f.write(self.payload)


root, wid, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
store = SnapshotStore(None, root)  # spark unused on the commit path
got = []
for i in range(n):
    got.append(store.commit(_MarkerDF(f"{wid}:{i}"), "t"))
print(",".join(map(str, got)))
"""


_MIXED_WORKER = r"""
import os, sys

from oracle_to_oracle_data_integration_pipeline_spark.sources.snapshots import SnapshotStore


class _MarkerDF:
    def __init__(self, payload):
        self.payload = payload

    @property
    def write(self):
        return self

    def mode(self, m):
        assert m == "errorifexists"
        return self

    def parquet(self, path):
        os.makedirs(path, exist_ok=False)
        with open(os.path.join(path, "marker.txt"), "w") as f:
            f.write(self.payload)


root, wid, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
store = SnapshotStore(None, root)
ops = []
for i in range(n):
    kind = "commit"
    if i % 5 == 4:
        kind = "vacuum"
    elif i % 7 == 3:
        kind = "restore"
    try:
        if kind == "vacuum":
            store.vacuum("t", keep_last=3)
        elif kind == "restore":
            latest = store.latest_version("t")
            if latest is None or latest < 1:
                kind = "commit"
                store.commit(_MarkerDF(f"{wid}:{i}"), "t")
            else:
                # the target may be vacuumed away by a racing worker
                # between this read and the lock — that loud failure
                # is the CONTRACT (never mixed state), so just skip
                store.restore("t", latest - 1)
        else:
            store.commit(_MarkerDF(f"{wid}:{i}"), "t")
    except FileNotFoundError:
        kind += ":skipped"
    ops.append(kind)
print(",".join(ops))
"""


def test_multiprocess_mixed_workload_integrity(tmp_path):
    """5 processes interleave commit / restore / vacuum on one table.
    No specific interleaving is asserted — only the store INVARIANTS
    that must survive every interleaving: the published pointer
    resolves to an intact manifest chain, every retained manifest's
    data dir exists (vacuum's name-based orphan sweep must never
    condemn a live dir, including restore-shared ones), retained
    versions are a contiguous suffix, and no torn temp files remain."""
    import json as _json

    root = str(tmp_path / "warehouse")
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _MIXED_WORKER, root, f"w{w}", "10"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for w in range(5)
    ]
    for w, p in enumerate(procs):
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker {w} failed:\n{err}"

    tdir = os.path.join(root, "t")
    with open(os.path.join(tdir, "_latest")) as f:
        latest = int(f.read())
    from oracle_to_oracle_data_integration_pipeline_spark.sources.snapshots import (
        SnapshotStore,
    )

    store = SnapshotStore(None, root)
    hist = store.history("t")
    assert hist, "no retained history"
    versions = [m["version"] for m in hist]
    # retained versions are a strictly ascending contiguous suffix
    assert versions == list(range(versions[0], latest + 1))
    for m in hist:
        assert os.path.isdir(m["data_path"]), f"live data dir lost: {m}"
        if m["operation"] == "overwrite":
            assert os.path.exists(os.path.join(m["data_path"], "marker.txt"))
        assert m["parent"] is None or m["parent"] == m["version"] - 1
    # no torn temp files anywhere
    leftovers = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tdir)
        for f in fs
        if f.endswith(".tmp")
    ]
    assert leftovers == []
    # a fresh commit after the storm still works (no wedged state)
    with open(os.path.join(tdir, "_manifests", f"{latest}.json")) as f:
        assert _json.load(f)["version"] == latest


def test_multiprocess_commit_hammer(tmp_path):
    root = str(tmp_path / "warehouse")
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, root, f"w{w}", str(N_COMMITS)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(N_PROCS)
    ]
    per_worker = {}
    for w, p in enumerate(procs):
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"worker {w} failed:\n{err}"
        per_worker[f"w{w}"] = [int(v) for v in out.strip().split(",")]

    total = N_PROCS * N_COMMITS
    all_versions = sorted(v for vs in per_worker.values() for v in vs)
    # dense, no lost update, no duplicate
    assert all_versions == list(range(total))
    # each worker's own versions strictly increase (commit order held)
    for vs in per_worker.values():
        assert vs == sorted(vs) and len(set(vs)) == len(vs)

    tdir = os.path.join(root, "t")
    with open(os.path.join(tdir, "_latest")) as f:
        assert int(f.read()) == total - 1
    # every manifest intact with a correct parent chain, every data
    # dir attributed to exactly the committer that owns the version
    owner = {
        v: f"{wid}:{i}"
        for wid, vs in per_worker.items()
        for i, v in enumerate(vs)
    }
    for v in range(total):
        with open(os.path.join(tdir, "_manifests", f"{v}.json")) as f:
            m = json.load(f)
        assert m["version"] == v
        assert m["parent"] == (None if v == 0 else v - 1)
        with open(os.path.join(m["data_path"], "marker.txt")) as f:
            assert f.read() == owner[v]
    # no torn temp files anywhere
    leftovers = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tdir)
        for f in fs
        if f.endswith(".tmp")
    ]
    assert leftovers == []
