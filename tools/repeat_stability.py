#!/usr/bin/env python
"""Repeat-stability probe: run each given qid N times in ONE session
(clearCache between runs) and flag growth across executions.

This codifies the round-2 judge protocol that caught the minhash
session-state leak (7s -> 55s -> 120s across repeats from accumulating
localCheckpoint RDDs): in a healthy engine, repeat timings are flat or
improving (JIT warm-up), never compounding. Run after touching any
operator that caches, checkpoints, or collects:

    python tools/repeat_stability.py minhash_dedup dedup_components

Exit code 1 if any qid's last run exceeds GROWTH_LIMIT x its first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("REPEATS", "3"))
GROWTH_LIMIT = float(os.environ.get("GROWTH_LIMIT", "1.5"))

DEFAULT_QIDS = [
    # every operator that caches / localCheckpoints / collects mid-plan
    "minhash_dedup",
    "dedup_components",
    "pagerank",
    "kmeans_assign",
    "bpe_train",
    "bloom_join",
    "cdc_merge",
    "bpe_encode",
    "neardup_resolve",
    "bfs_levels",           # localCheckpoints per BFS round
    "snapshot_cdf",         # r7: feed localCheckpoints before the store dir dies
    "sql_ddl_roundtrip",    # catalog DDL + tempdir lifecycle per run
    "checksum_drill",       # collects flagged buckets mid-plan
    "stream_ewma",          # streaming harness: tempdir + memory sink per run
    # round-4 plan rewrites (global window -> TakeOrdered / sketch
    # cuts) — watched here so the fixes are measured, not asserted
    "token_freq",
    "pareto_revenue",
    "vocab_build",
    # round-4 wave 2: per-run tempdir + mid-plan collect / temp-view +
    # UDTF re-registration lifecycles
    "binary_ingest",
    "python_udtf",
    # round-5: snapshot-store commit/merge tempdir lifecycle, Python
    # sink stage/publish lifecycle (both collect eagerly per run)
    "snapshot_merge",
    "pysink_audit",
    # round-8: stage-persisted composition qid (3 MEMORY_AND_DISK
    # caches per run, never unpersisted — watched for compounding)
    "curation_release",
    # round-8: end-biased estimator persists its two count tables
    "join_size_estimate",
    # round-9: CDC composition qid (5 MEMORY_AND_DISK stage caches per
    # run, never unpersisted — same watch class as curation_release)
    "replication_audit",
]


def main() -> int:
    qids = sys.argv[1:] or DEFAULT_QIDS
    spark = get_spark(app_name="o2o_repeat", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    reg = q.all_queries()
    rc = 0
    for qid in qids:
        times = []
        for i in range(REPEATS):
            t0 = time.time()
            reg[qid](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times.append(time.time() - t0)
            spark.catalog.clearCache()
        # warm-up makes run0 the slowest in a healthy engine; leaks make
        # the LAST run the slowest and growing
        grew = times[-1] > GROWTH_LIMIT * times[0]
        flag = "LEAK?" if grew else "ok"
        if grew:
            rc = 1
        print(f"{qid}: {' '.join(f'{t:.2f}s' for t in times)} [{flag}]", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
