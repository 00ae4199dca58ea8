#!/usr/bin/env python
"""Partitioning-invariance sweep: every oracle-checked qid must produce
the IDENTICAL value hash regardless of ``spark.sql.shuffle.partitions``
and of the local core count.

Why this axis matters (VERDICT r8 ask #1): the round-7/8 fuzz classes —
nullable window tie-breaks, engine-arbitrary equal-key order, NULL-key
window partitions — are exactly the bugs that hide behind a FIXED
partition count: with 32 shuffle partitions two tied rows may land in a
stable arbitrary order for run after run, then flip when the shuffle
fans out differently. Seven fuzz profiles varied the DATA; this tool
varies the EXECUTION GEOMETRY on the clean fixture, which is the other
half of the determinism contract a 100 TB cluster relies on (a real
cluster never has the same partition count twice).

Protocol: each (cpus, shuffle.partitions) cell runs in a FRESH JVM
(subprocess) so no cached stage computed under one geometry can mask
sensitivity under another; within a cell every qid's result is reduced
to the driver-faithful value hash (name-sorted columns, normalized
sorted row tuples — tests/duck_compare._rowset, the same
canonicalization the round driver hashes). Cells:

    c32p1  — local[32], shuffle.partitions=1   (everything collapses)
    c32p7  — local[32], shuffle.partitions=7   (prime, never the default)
    c32p32 — local[32], shuffle.partitions=32  (the recorded baseline)
    c4p7   — local[4],  shuffle.partitions=7   (core-count axis: task
             scheduling, Arrow batch boundaries, Python worker reuse)

Usage:
    python tools/partition_parity.py                  # full matrix
    python tools/partition_parity.py --qids a,b,c     # subset
    python tools/partition_parity.py --cell 32:7 --out /tmp/h.json
                                                      # one cell (internal)

Exit code: number of qids with divergent hashes or per-cell errors.
Record: docs/PARTITION_PARITY.json (cells, per-qid verdicts, finds).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

CELLS = [(32, 1), (32, 7), (32, 32), (4, 7)]
DEFAULT_SF = "/root/testdata/sf0.01"


def run_cell(cpus: int, parts: int, sf_dir: str, qids: list[str] | None, out: str) -> None:
    from oracle_to_oracle_data_integration_pipeline_spark import queries as q
    from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark
    from tests.duck_compare import _rowset

    spark = get_spark(
        app_name=f"o2o_partition_parity_c{cpus}p{parts}",
        cpus=cpus,
        shuffle_partitions=parts,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    registry = q.all_queries()
    osql = q.all_oracle_sql()
    targets = qids or sorted(k for k in registry if k in osql)
    hashes: dict[str, str] = {}
    for qid in targets:
        t0 = time.time()
        try:
            df = registry[qid](spark, sf_dir)
            cols = [c.lower() for c in df.columns]
            rows = [tuple(r) for r in df.collect()]
            canon = _rowset(cols, rows)
            h = hashlib.sha256(
                (repr(sorted(cols)) + "\n" + repr(canon)).encode()
            ).hexdigest()[:16]
            hashes[qid] = h
        except Exception as e:  # an error cell is a finding, not an abort
            hashes[qid] = f"ERROR:{type(e).__name__}:{str(e).splitlines()[0][:120]}"
        line = f"c{cpus}p{parts} {qid} {hashes[qid]} {time.time() - t0:.1f}s"
        print(line, flush=True)
        # sidecar progress log: the orchestrator captures stdout, so a
        # long cell would otherwise be unmonitorable from outside
        with open(out + ".log", "a") as lf:
            lf.write(line + "\n")
    with open(out, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF)
    ap.add_argument("--qids", default=None, help="comma-separated subset")
    ap.add_argument("--cell", default=None, help="internal: run one 'cpus:parts' cell")
    ap.add_argument("--out", default=None, help="internal: cell hash JSON path")
    ap.add_argument("--record", default=os.path.join(REPO, "docs", "PARTITION_PARITY.json"))
    args = ap.parse_args()
    qids = [s for s in (args.qids or "").split(",") if s.strip()] or None

    if args.cell:
        cpus, parts = (int(x) for x in args.cell.split(":"))
        run_cell(cpus, parts, args.sf, qids, args.out or f"/tmp/pp_c{cpus}p{parts}.json")
        return 0

    cell_hashes: dict[str, dict[str, str]] = {}
    for cpus, parts in CELLS:
        tag = f"c{cpus}p{parts}"
        out = f"/tmp/pp_{tag}.json"
        t0 = time.time()
        cmd = [sys.executable, os.path.abspath(__file__), "--cell", f"{cpus}:{parts}",
               "--sf", args.sf, "--out", out]
        if args.qids:
            cmd += ["--qids", args.qids]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0 or not os.path.exists(out):
            print(f"== {tag}: cell process FAILED rc={r.returncode}", flush=True)
            for ln in (r.stdout + r.stderr).splitlines()[-10:]:
                print("   ", ln[:160])
            cell_hashes[tag] = {}
            continue
        with open(out) as f:
            cell_hashes[tag] = json.load(f)
        print(f"== {tag}: {len(cell_hashes[tag])} qids hashed ({time.time() - t0:.0f}s)",
              flush=True)

    all_qids = sorted({q for h in cell_hashes.values() for q in h})
    finds: dict[str, dict[str, str]] = {}
    for qid in all_qids:
        per = {tag: h.get(qid, "MISSING") for tag, h in cell_hashes.items()}
        vals = set(per.values())
        if len(vals) != 1 or any(v.startswith(("ERROR", "MISSING")) for v in vals):
            finds[qid] = per
    record = {
        "sf": args.sf,
        "cells": [f"c{c}p{p}" for c, p in CELLS],
        "n_qids": len(all_qids),
        "n_invariant": len(all_qids) - len(finds),
        "finds": finds,
    }
    with open(args.record, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(
        f"partition parity: {record['n_invariant']}/{len(all_qids)} qids "
        f"hash-invariant across {len(CELLS)} cells"
        + (f"; DIVERGENT: {sorted(finds)}" if finds else "")
    )
    return len(finds)


if __name__ == "__main__":
    sys.exit(main())
