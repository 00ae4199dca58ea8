#!/usr/bin/env python
"""Memory-pressure cell: the plans must SPILL, not die — and not
change their answers — when executor memory per task is starved.

Why this axis matters (VERDICT r9 ask #2): at 100 TB the binding
constraint is executor memory per task; hash aggregates fall back to
sort-based spill, sort-merge joins spill their buffers, Arrow batches
queue against a fixed pool. Nothing else in the audit matrix exercises
those spill paths — local[32] with a 24g driver never feels pressure
at sf0.1. This tool reruns the workload in a deliberately starved
fresh JVM and asserts (a) every query completes (no OOM) and (b) the
driver-faithful value hash is unchanged: an operator whose answer
shifts under spill (e.g. an agg relying on in-memory iteration order,
a kernel allocating per-partition state proportional to input) is a
real 100 TB wrong-answer/stability bug.

Cells (fresh JVM each — driver memory is a JVM-start knob):

    ample   — the recorded default (SPARK_GRAFT_DRIVER_MEM or 24g)
    starved — 3g heap + spark.memory.fraction=0.3 (≈0.9g for ALL
              execution+storage across 32 concurrent tasks) + tiny
              Arrow batches; the tightest setting that still boots

Modes:
    --mode registry  (default) every oracle qid at sf0.01
    --mode headline  bench.py's 43-query headline set at sf0.1

Usage:
    python tools/memory_pressure.py
    python tools/memory_pressure.py --mode headline
    python tools/memory_pressure.py --cell starved --out /tmp/h.json

Exit code: number of divergent/errored qids.
Record: docs/MEMORY_PRESSURE.json (or *_headline.json).
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

STARVED_MEM = os.environ.get("SPARK_GRAFT_STARVED_MEM", "3g")
CELL_CONF: dict[str, dict[str, str]] = {
    "ample": {},
    "starved": {
        # 30% of a 3g heap shared by execution+storage: every hash agg
        # and join buffer beyond ~1g must spill or the query dies
        "spark.memory.fraction": "0.3",
        # small Arrow slices so Python-side batches don't mask pressure
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
    },
}


def run_cell(tag: str, sf_dir: str, qids: list[str] | None, mode: str, out: str) -> None:
    from oracle_to_oracle_data_integration_pipeline_spark import queries as q
    from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark
    from tests.duck_compare import _rowset

    conf = dict(CELL_CONF[tag])
    conf["spark.ui.showConsoleProgress"] = "false"
    spark = get_spark(app_name=f"o2o_mem_{tag}", extra_conf=conf)
    jconf = spark.sparkContext._conf
    print(f"{tag}: driver.memory={jconf.get('spark.driver.memory', '?')} "
          f"fraction={jconf.get('spark.memory.fraction', 'default(0.6)')}",
          flush=True)
    registry = q.all_queries()
    if qids:
        targets = [t for t in qids if t in registry]
    elif mode == "headline":
        sys.path.insert(0, REPO)
        import bench

        targets = [t for t in bench.HEADLINE if t in registry]
    else:
        osql = q.all_oracle_sql()
        targets = sorted(k for k in registry if k in osql)
    hashes: dict[str, str] = {}
    for qid in targets:
        t0 = time.time()
        try:
            spark.catalog.clearCache()  # starved cells can't hoard stages
            df = registry[qid](spark, sf_dir)
            cols = [c.lower() for c in df.columns]
            rows = [tuple(r) for r in df.collect()]
            canon = _rowset(cols, rows)
            hashes[qid] = hashlib.sha256(
                (repr(sorted(cols)) + "\n" + repr(canon)).encode()
            ).hexdigest()[:16]
        except Exception as e:
            hashes[qid] = f"ERROR:{type(e).__name__}:{str(e).splitlines()[0][:120]}"
        line = f"{tag} {qid} {hashes[qid]} {time.time() - t0:.1f}s"
        print(line, flush=True)
        with open(out + ".log", "a") as lf:
            lf.write(line + "\n")
    with open(out, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["registry", "headline"], default="registry")
    ap.add_argument("--sf", default=None)
    ap.add_argument("--qids", default=None)
    ap.add_argument("--cell", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--record", default=None)
    args = ap.parse_args()
    sf = args.sf or ("/root/testdata/sf0.1" if args.mode == "headline"
                     else "/root/testdata/sf0.01")
    record = args.record or os.path.join(
        REPO, "docs",
        "MEMORY_PRESSURE_headline.json" if args.mode == "headline"
        else "MEMORY_PRESSURE.json",
    )
    qids = [s for s in (args.qids or "").split(",") if s.strip()] or None

    if args.cell:
        run_cell(args.cell, sf, qids, args.mode, args.out or f"/tmp/mem_{args.cell}.json")
        return 0

    cell_hashes: dict[str, dict[str, str]] = {}
    for tag in CELL_CONF:
        out = f"/tmp/mem_{tag}_{args.mode}.json"
        env = dict(os.environ)
        if tag == "starved":
            env["SPARK_GRAFT_DRIVER_MEM"] = STARVED_MEM
        t0 = time.time()
        cmd = [sys.executable, os.path.abspath(__file__), "--cell", tag,
               "--mode", args.mode, "--sf", sf, "--out", out]
        if args.qids:
            cmd += ["--qids", args.qids]
        r = subprocess.run(cmd, capture_output=True, text=True, env=env)
        if r.returncode != 0 or not os.path.exists(out):
            print(f"== {tag}: cell FAILED rc={r.returncode}", flush=True)
            for ln in (r.stdout + r.stderr).splitlines()[-10:]:
                print("   ", ln[:160])
            cell_hashes[tag] = {}
            continue
        with open(out) as f:
            cell_hashes[tag] = json.load(f)
        print(f"== {tag}: {len(cell_hashes[tag])} qids ({time.time() - t0:.0f}s)",
              flush=True)

    all_qids = sorted({q for h in cell_hashes.values() for q in h})
    finds: dict[str, dict[str, str]] = {}
    for qid in all_qids:
        per = {tag: h.get(qid, "MISSING") for tag, h in cell_hashes.items()}
        if len(set(per.values())) != 1 or any(
            v.startswith(("ERROR", "MISSING")) for v in per.values()
        ):
            finds[qid] = per
    rec = {
        "mode": args.mode,
        "sf": sf,
        "starved_mem": STARVED_MEM,
        "cells": CELL_CONF,
        "n_qids": len(all_qids),
        "n_invariant": len(all_qids) - len(finds),
        "finds": finds,
    }
    with open(record, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(
        f"memory pressure ({args.mode}): {rec['n_invariant']}/{len(all_qids)} "
        f"qids complete + hash-invariant under {STARVED_MEM}/fraction=0.3"
        + (f"; FINDS: {sorted(finds)}" if finds else "")
    )
    return len(finds)


if __name__ == "__main__":
    sys.exit(main())
