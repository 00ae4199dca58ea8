#!/usr/bin/env python
"""Plan-config invariance sweep: every oracle-checked qid must produce
the IDENTICAL value hash when the optimizer's physical-strategy knobs
are flipped — AQE disabled, threshold broadcasts disabled (every
non-hinted join forced to sort-merge), whole-stage codegen off.

Why this axis matters (VERDICT r9 ask #1): partition_parity varies the
execution GEOMETRY and fuzz_parity varies the DATA; this tool varies
the PLAN the optimizer is allowed to pick. It is the local stand-in
for "the plan Catalyst chooses on a real 1000-executor cluster differs
from local[32]": AQE re-plans at runtime (skew splits, dynamic
broadcast, partition coalescing), a conservative cluster may never
broadcast what local mode broadcasts, and interpreted (non-codegen)
expression evaluation is a genuinely different evaluator. A result
that depends on WHICH physical strategy ran — join-order-sensitive
tie-breaks, broadcast-vs-SMJ output order leaking through a window,
codegen-specific float folding — is a 100 TB wrong-answer bug that no
geometry or data sweep can see.

Protocol: each cell runs in a FRESH JVM (subprocess) so a stage cached
under one config cannot mask sensitivity under another; within a cell
every qid reduces to the driver-faithful value hash (name-sorted
columns, normalized sorted row tuples — tests/duck_compare._rowset).
Cells (base is the recorded default config):

    base      — the engine's defaults (AQE on, broadcasts on, codegen on)
    aqeoff    — spark.sql.adaptive.enabled=false (no runtime re-plan)
    smj       — autoBroadcastJoinThreshold=-1 on both the static and
                AQE paths: every THRESHOLD broadcast becomes a
                sort-merge join (explicit broadcast() hints still
                apply — at scale hints are a contract, thresholds are
                a heuristic)
    nocodegen — spark.sql.codegen.wholeStage=false (interpreted
                expression evaluation + no codegen fusion)

Usage:
    python tools/config_parity.py                  # full matrix
    python tools/config_parity.py --qids a,b,c     # subset
    python tools/config_parity.py --cell aqeoff --out /tmp/h.json
                                                   # one cell (internal)

Exit code: number of qids with divergent hashes or per-cell errors.
Record: docs/CONFIG_PARITY.json (cells, per-qid verdicts, finds).
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

CELLS: dict[str, dict[str, str]] = {
    "base": {},
    "aqeoff": {"spark.sql.adaptive.enabled": "false"},
    "smj": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    },
    "nocodegen": {"spark.sql.codegen.wholeStage": "false"},
}
DEFAULT_SF = "/root/testdata/sf0.01"


def run_cell(tag: str, sf_dir: str, qids: list[str] | None, out: str) -> None:
    from oracle_to_oracle_data_integration_pipeline_spark import queries as q
    from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark
    from tests.duck_compare import _rowset

    conf = dict(CELLS[tag])
    conf["spark.ui.showConsoleProgress"] = "false"
    spark = get_spark(app_name=f"o2o_config_parity_{tag}", extra_conf=conf)
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
        line = f"{tag} {qid} {hashes[qid]} {time.time() - t0:.1f}s"
        print(line, flush=True)
        with open(out + ".log", "a") as lf:
            lf.write(line + "\n")
    with open(out, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF)
    ap.add_argument("--qids", default=None, help="comma-separated subset")
    ap.add_argument("--cell", default=None, help="internal: run one named cell")
    ap.add_argument("--out", default=None, help="internal: cell hash JSON path")
    ap.add_argument("--record", default=os.path.join(REPO, "docs", "CONFIG_PARITY.json"))
    args = ap.parse_args()
    qids = [s for s in (args.qids or "").split(",") if s.strip()] or None

    if args.cell:
        run_cell(args.cell, args.sf, qids, args.out or f"/tmp/cp_{args.cell}.json")
        return 0

    cell_hashes: dict[str, dict[str, str]] = {}
    for tag in CELLS:
        out = f"/tmp/cp_{tag}.json"
        t0 = time.time()
        cmd = [sys.executable, os.path.abspath(__file__), "--cell", tag,
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
        "cells": {tag: conf for tag, conf in CELLS.items()},
        "n_qids": len(all_qids),
        "n_invariant": len(all_qids) - len(finds),
        "finds": finds,
    }
    with open(args.record, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(
        f"config parity: {record['n_invariant']}/{len(all_qids)} qids "
        f"hash-invariant across {len(CELLS)} config cells"
        + (f"; DIVERGENT: {sorted(finds)}" if finds else "")
    )
    return len(finds)


if __name__ == "__main__":
    sys.exit(main())
