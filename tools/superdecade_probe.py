#!/usr/bin/env python
"""Super-decade scaling probe (VERDICT r7 ask #3): /root/testdata tops
out at sf0.1, so every SCALING.md ratio is measured over one decade
(0.01→0.1). This tool synthesizes a ~10× sf0.1 fixture for the tables
a target qid reads — K key-shifted copies, so JOIN/GROUP key
cardinality scales with the data instead of multiplying per-key row
counts — and measures the single-query ratio t(10×)/t(sf0.1) in one
warm session. A plan that is linear-at-worst must come in at or under
the data ratio; the two standing worst ratios (salted_join 3.4×,
json_extract 2.6× over 0.01→0.1) are overhead-dominated suspicions
this probe confirms or refutes one decade further out.

    python tools/superdecade_probe.py            # both target qids
    python tools/superdecade_probe.py salted_join

Key shifting: copy i of a table adds i * 10^9 to every key column
named in SHIFT_COLS, keeping FK pairs (l_orderkey ↔ o_orderkey)
consistent within a copy and disjoint across copies. Non-key columns
replicate unchanged — same value distributions, same skew shape.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("COPIES", "10"))
REPEATS = int(os.environ.get("REPEATS", "3"))
SHIFT = 10**9

# qid -> {table: spec}; spec is either a list of key columns to shift
# (back-compat) or a dict with any of:
#   "shift":  key columns, copy i adds i * 10^9 (disjoint key spaces)
#   "xlate":  text columns, copy i applies a per-copy character
#             bijection (rotate 'abcdefghij' by i). Equality and
#             Jaccard WITHIN a copy are exactly preserved (bijection on
#             strings), while shingle sets are disjoint-ish ACROSS
#             copies — so duplicate/near-dup DENSITY stays constant as
#             volume scales, which a bare 10x text replication would
#             not do (identical text in every copy → one 10x-bigger dup
#             class → pair counts grow 100x and the probe would measure
#             a density change, not a scale-up).
#   "copies": override copy count — 1 replicates the table unchanged
#             (fixed dimensions like nation must NOT be multiplied:
#             duplicated dim rows duplicate join matches).
TARGETS = {
    "salted_join": {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
    },
    "json_extract": {
        "events": ["event_id"],
    },
    # VERDICT r8 ask #3: the five most expensive headline queries.
    "bloom_join": {
        "lineitem": ["l_suppkey"],
        "supplier": ["s_suppkey"],
        "nation": {"copies": 1},
    },
    "checksum_diff": {
        "orders": ["o_orderkey"],
    },
    "kmeans_assign": {
        "embeddings": ["vec_id"],
    },
    "dedup_components": {
        "documents": {"shift": ["doc_id"], "xlate": ["text"]},
    },
    "minhash_dedup": {
        "documents": {"shift": ["doc_id"], "xlate": ["text"]},
    },
    # VERDICT r9 ask #4: the four remaining >=0.9 s headline queries.
    # q1 is a pure lineitem scan+agg (tiny group domain — per-group
    # counts grow 10x, group count doesn't; that IS the scale shape).
    "q1_pricing_summary": {
        "lineitem": ["l_orderkey"],
    },
    # q9: fact ⋈ part ⋈ orders ⋈ supplier ⋈ nation — all join keys
    # shift together so key cardinality scales with volume; nation is
    # a fixed broadcast dim (s_nationkey intentionally NOT shifted).
    "q9_product_profit": {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "nation": {"copies": 1},
    },
    # q18: HAVING semi-join against the grouped fact, then re-agg.
    # Shifting l_orderkey/o_orderkey/c_custkey keeps per-order line
    # counts constant (bare replication would 10x every order's
    # quantity sum and flip the >300 predicate's selectivity).
    "q18_large_orders": {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
    },
    # stream_tumbling: probed through its batch twin (the identical
    # transformation object over a batch events read —
    # streaming_queries.batch_twin, fidelity pinned by
    # tests/test_stream_batch_twins.py). The streaming drain's
    # checkpoint/trigger overhead is fixed-cost harness, not plan;
    # the twin isolates the part that scales.
    "stream_tumbling": {
        "events": ["event_id"],
    },
}

# qid -> callable(spark, sf_dir) -> DataFrame, overriding the registry
# runner where the qid's own entry wraps a harness the probe should
# bypass (streaming drains).
def _tumbling_twin(spark, sf_dir):
    from oracle_to_oracle_data_integration_pipeline_spark.queries.streaming_queries import (
        batch_twin,
    )

    return batch_twin(spark, sf_dir, "stream_tumbling")


RUNNERS = {
    "stream_tumbling": _tumbling_twin,
}

_XLATE_SRC = "abcdefghij"


def blow_up(spark, table: str, spec, out_dir: str) -> int:
    if isinstance(spec, list):
        spec = {"shift": spec}
    shift_cols = spec.get("shift", [])
    xlate_cols = spec.get("xlate", [])
    n_copies = spec.get("copies", COPIES)
    src = spark.read.parquet(os.path.join(BASE, f"{table}.parquet"))
    copies = []
    for i in range(n_copies):
        c = src
        for col in shift_cols:
            c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
        rot = _XLATE_SRC[i % len(_XLATE_SRC):] + _XLATE_SRC[: i % len(_XLATE_SRC)]
        for col in xlate_cols:
            c = c.withColumn(col, F.translate(F.col(col), _XLATE_SRC, rot))
        copies.append(c)
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    path = os.path.join(out_dir, f"{table}.parquet")
    big.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def median_secs(fn, n: int) -> float:
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main() -> int:
    qids = sys.argv[1:] or sorted(TARGETS)
    spark = get_spark(app_name="o2o_superdecade", cpus=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    queries = q.all_queries()
    worst = 0.0
    for qid in qids:
        big_dir = tempfile.mkdtemp(prefix=f"o2o_super_{qid}_")
        try:
            rows = {
                t: blow_up(spark, t, cols, big_dir)
                for t, cols in TARGETS[qid].items()
            }
            runner = RUNNERS.get(qid) or (lambda sp, d: queries[qid](sp, d))
            run_base = lambda: runner(spark, BASE).collect()  # noqa: E731
            run_big = lambda: runner(spark, big_dir).collect()  # noqa: E731
            run_base()  # warm-up: JIT + codegen before any timed run
            t_base = median_secs(run_base, REPEATS)
            t_big = median_secs(run_big, REPEATS)
            ratio = t_big / t_base
            worst = max(worst, ratio)
            print(f"{qid}: base {t_base:.2f}s -> {COPIES}x {t_big:.2f}s "
                  f"= {ratio:.2f}x (data {COPIES}x, rows {rows})", flush=True)
        finally:
            shutil.rmtree(big_dir, ignore_errors=True)
    print(f"worst ratio {worst:.2f}x vs data ratio {COPIES}x: "
          + ("OK (at-worst-linear)" if worst <= COPIES else "SUPERLINEAR"))
    return 0 if worst <= COPIES else 1


if __name__ == "__main__":
    sys.exit(main())
