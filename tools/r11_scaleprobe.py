#!/usr/bin/env python
"""Round-11 scaling probe (VERDICT r10 item 5): at sf0.1 the bench is
fixed-cost bound — every 8-vs-32-core ratio reads ≈1 and the bench
cannot SEE distributed-algorithm improvements. This tool derives a
10×-replicated copy of the sf0.1 fixtures (key-shifted shards so join
multiplicities stay sane) into scratch and times the heavy queries at
two core counts, so parallel speedup becomes measurable.

The derived dataset is probe-only: bench.py, the oracle compares and
the driver contract never read it (TESTDATA.md fixtures stay
untouched). Shards shift every id-like key by shard×stride with ONE
shared stride, so intra-shard joins (orders⋈lineitem, documents
self-joins, embeddings ids) behave exactly like the original data —
the probe multiplies data volume, not join semantics.

Usage:
    python tools/r11_scaleprobe.py build          # materialize ~sf1
    python tools/r11_scaleprobe.py run 32         # time at local[32]
    python tools/r11_scaleprobe.py run 8          # time at local[8]
    python tools/r11_scaleprobe.py report         # ratios -> stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPL = int(os.environ.get("R11_PROBE_REPL", "10"))
BASE = "/root/testdata/sf0.1"
OUT = os.environ.get("R11_PROBE_DIR", "/dev/shm/o2o_scaleprobe_sf1")
RESULTS = os.environ.get("R11_PROBE_RESULTS", "/tmp/r11_scaleprobe_times.json")

# Heavy/parallelizable headline queries (joins, aggregation, dedup).
# Override with R11_PROBE_QIDS=a,b,c for a focused (e.g. larger-REPL)
# pass.
QIDS = os.environ.get("R11_PROBE_QIDS", "").split(",") if os.environ.get("R11_PROBE_QIDS") else [
    "q1_pricing_summary",
    "q5_local_supplier",
    "q9_product_profit",
    "q18_large_orders",
    "salted_join",
    "bloom_join",
    "checksum_diff",
    "minhash_dedup",
    "dedup_components",
    "decontaminate",
    "kmeans_assign",
]

# One shared stride larger than every id domain in the sf0.1 fixtures
# keeps shifted shards disjoint and foreign keys consistent.
STRIDE = 10_000_000

# id-like columns to shift per table; everything else replicates as-is
SHIFT_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
REPLICATED = list(SHIFT_COLS)
DIMS = ["region", "nation", "supplier", "part"]


def build() -> None:
    from pyspark.sql import functions as F

    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load
    from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

    spark = get_spark(app_name="o2o_scaleprobe_build",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    os.makedirs(OUT, exist_ok=True)
    for t in DIMS:
        load(spark, BASE, t).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{t}.parquet")
        )
    for t in REPLICATED:
        src = load(spark, BASE, t)
        shards = []
        for i in range(REPL):
            s = src
            for c in SHIFT_COLS[t]:
                dt = dict(s.dtypes)[c]
                s = s.withColumn(c, (F.col(c) + F.lit(i * STRIDE)).cast(dt))
            shards.append(s)
        out = shards[0]
        for s in shards[1:]:
            out = out.unionByName(s)
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))
        print(f"built {t}: {REPL}x", flush=True)
    print("done:", OUT)


def run(cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from oracle_to_oracle_data_integration_pipeline_spark import queries as q
    from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"o2o_scaleprobe_{cpus}", cpus=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    reg = q.all_queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    for qid in QIDS:  # JIT/codegen warmup on the small fixture
        force(reg[qid](spark, "/root/testdata/sf0.001"))
    runs = int(os.environ.get("R11_PROBE_RUNS", "2"))
    samples: dict[str, list[float]] = {qid: [] for qid in QIDS}
    for _ in range(runs):
        for qid in QIDS:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(reg[qid](spark, OUT))
            samples[qid].append(round(time.perf_counter() - t0, 3))
    acc = {}
    if os.path.exists(RESULTS):
        acc = json.load(open(RESULTS))
    acc[str(cpus)] = {qid: min(ts) for qid, ts in samples.items()}
    json.dump(acc, open(RESULTS, "w"), indent=1)
    print(json.dumps(acc[str(cpus)], indent=1))


def report() -> None:
    acc = json.load(open(RESULTS))
    lo, hi = sorted(acc, key=int)
    print(f"| query | local[{lo}] s | local[{hi}] s | speedup {lo}->{hi} |")
    print("|---|---|---|---|")
    for qid in QIDS:
        a, b = acc[lo].get(qid), acc[hi].get(qid)
        if a and b:
            print(f"| {qid} | {a} | {b} | {a / b:.2f}x |")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "build":
        build()
    elif cmd == "run":
        run(int(sys.argv[2]))
    else:
        report()
