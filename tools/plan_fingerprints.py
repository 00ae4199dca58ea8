#!/usr/bin/env python
"""Full-registry plan-fingerprint snapshot: for every batch qid, count
the plan features that define its scale behavior — join strategies,
exchange kinds, window/limit forms, Python-eval nodes, generates,
scans — and diff against the committed snapshot.

Why: the per-qid plan gates in tests/test_plans.py pin the ~40 plans
whose shape was explicitly designed; the other ~180 qids have no gate,
so a silent planner regression there (a broadcast flipping to
sort-merge, a new exchange sneaking in, a JVM expression falling back
to Python) would pass every correctness check and only surface as an
unexplained bench delta rounds later. The fingerprint snapshot is the
cheap tripwire: any drift fails loudly with a qid-level diff.

    python tools/plan_fingerprints.py            # diff against snapshot
    python tools/plan_fingerprints.py --update   # regenerate snapshot

The snapshot (docs/PLAN_FINGERPRINTS.json) is generated at sf0.01 (the
same fixture stats the plan gates use — broadcast decisions are
stats-dependent, so the sf is part of the contract) and is
deterministic under the pinned Spark version: counts of node KINDS,
never partition numbers or expression ids. Streaming/pysource qids are
skipped (plans are built per micro-batch). Regenerate deliberately,
with the diff in the commit message, whenever a plan change is
intentional.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "PLAN_FINGERPRINTS.json",
)

# feature -> substring counted in executedPlan().toString()
FEATURES = {
    "exchange_hash": "Exchange hashpartitioning",
    "exchange_single": "Exchange SinglePartition",
    "exchange_range": "Exchange rangepartitioning",
    "broadcast_hash_join": "BroadcastHashJoin",
    "sort_merge_join": "SortMergeJoin",
    "shuffled_hash_join": "ShuffledHashJoin",
    "broadcast_nlj": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "generate": "Generate",
    "window": "Window ",
    "window_group_limit": "WindowGroupLimit",
    "take_ordered": "TakeOrderedAndProject",
    "global_limit": "GlobalLimit",
    "expand": "Expand",
    "map_in_pandas": "MapInPandas",
    "flatmap_groups_in_pandas": "FlatMapGroupsInPandas",
    "arrow_eval_python": "ArrowEvalPython",
    "batch_eval_python": "BatchEvalPython",
    "python_data_source": "PythonDataSource",
    "scan_parquet": "Scan parquet",
    "scan_jdbc": "Scan JDBCRelation",
    "collect_metrics": "CollectMetrics",
}


def fingerprint(plan: str) -> dict[str, int]:
    return {k: plan.count(sub) for k, sub in FEATURES.items() if plan.count(sub)}


def build(spark=None) -> tuple[dict[str, dict[str, int]], list[tuple[str, str]]]:
    spark = spark or get_spark(
        app_name="o2o_plan_fingerprints",
        cpus=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, int]] = {}
    errs: list[tuple[str, str]] = []
    for qid, fn in sorted(q.all_queries().items()):
        if qid.startswith("stream_") or "pysource" in qid:
            continue
        try:
            spark.catalog.clearCache()
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report, don't die mid-sweep
            errs.append((qid, str(e).splitlines()[0][:120]))
            continue
        out[qid] = fingerprint(plan)
    return out, errs


def diff(current: dict, snapshot: dict) -> list[str]:
    lines = []
    for qid in sorted(set(current) | set(snapshot)):
        c, s = current.get(qid), snapshot.get(qid)
        if c == s:
            continue
        if s is None:
            lines.append(f"{qid}: NEW (not in snapshot) {c}")
        elif c is None:
            lines.append(f"{qid}: REMOVED (was {s})")
        else:
            keys = sorted(set(c) | set(s))
            delta = {
                k: f"{s.get(k, 0)}->{c.get(k, 0)}"
                for k in keys
                if c.get(k, 0) != s.get(k, 0)
            }
            lines.append(f"{qid}: {delta}")
    return lines


def main() -> int:
    update = "--update" in sys.argv
    current, errs = build()
    for qid, err in errs:
        print(f"ERROR building {qid}: {err}")
    if update:
        with open(SNAPSHOT, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
        print(f"wrote {SNAPSHOT}: {len(current)} qids")
        return 1 if errs else 0
    if not os.path.exists(SNAPSHOT):
        print(f"no snapshot at {SNAPSHOT}; run with --update first")
        return 1
    with open(SNAPSHOT) as f:
        snapshot = json.load(f)
    lines = diff(current, snapshot)
    for line in lines:
        print(f"DRIFT {line}")
    print(f"checked {len(current)} qids against snapshot: {len(lines)} drifted")
    return 1 if lines or errs else 0


if __name__ == "__main__":
    sys.exit(main())
