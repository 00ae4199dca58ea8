#!/usr/bin/env python
"""Round-10 optimization profiler: for each qid, run the bench-identical
noop action at sf0.1 and break the wall time down into the JOBS (driver
actions) and STAGES Spark actually ran, from the AppStatusStore.

This answers "where does the time go" for queries whose cost is fixed
overhead (many small jobs: collects, eager checkpoints, streaming
micro-batches) vs data-proportional compute — the guide §1 measurement
step the bench total alone cannot give.

Usage: python tools/r10_profile.py [qid ...]   (default: top bench qids)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QIDS = [
    "kmeans_assign", "bloom_join", "dedup_components", "stream_tumbling",
    "salted_join", "binary_ingest", "minhash_dedup", "q1_pricing_summary",
    "checksum_diff", "pareto_revenue",
]


def _jobs(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    lst = store.jobsList(None)
    out = []
    for i in range(lst.size()):
        j = lst.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()
        t0 = sub.get().getTime() if sub.isDefined() else None
        t1 = comp.get().getTime() if comp.isDefined() else None
        out.append({
            "id": j.jobId(),
            "name": (j.name() or "")[:90],
            "ms": (t1 - t0) if (t0 and t1) else None,
            "tasks": j.numTasks(),
            "stages": j.stageIds().size(),
        })
    return sorted(out, key=lambda d: d["id"])


def main() -> None:
    qids = sys.argv[1:] or DEFAULT_QIDS
    spark = get_spark(app_name="o2o_r10_profile",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    reg = q.all_queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    for qid in qids:  # warmup: JIT/codegen at the small sf
        force(reg[qid](spark, "/root/testdata/sf0.001"))

    reps = int(os.environ.get("R10_PROFILE_REPS", "2"))
    for qid in qids:
        for rep in range(reps):
            spark.catalog.clearCache()
            before = {j["id"] for j in _jobs(spark)}
            t0 = time.perf_counter()
            force(reg[qid](spark, SF_DIR))
            wall = time.perf_counter() - t0
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
            jobs = [j for j in _jobs(spark) if j["id"] not in before]
            jsum = sum(j["ms"] or 0 for j in jobs)
            print(f"\n== {qid} (run {rep + 1}): wall {wall:.3f}s, {len(jobs)} jobs "
                  f"(sum {jsum/1000:.3f}s, gap {wall - jsum/1000:.3f}s)")
            if rep + 1 == reps:  # steady-state run: full job table
                for j in jobs:
                    print(f"   job {j['id']:>4} {j['ms'] or -1:>6}ms "
                          f"tasks={j['tasks']:>4} stages={j['stages']} {j['name']}")


if __name__ == "__main__":
    main()
