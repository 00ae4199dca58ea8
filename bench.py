#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {qid: sec}, "sf": ...}

Execution is forced with the noop sink (full computation, no collect
or disk cost measured). A small sf0.001 warmup primes the JVM/codegen
so the numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: flagship + the operators that matter at scale
# (CDC merge, window rank, dedup scale path, ANN, text, streaming).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "cdc_merge",
    "merge_stats",
    "latest_per_key",
    "window_topk",
    "agg_rollup",
    "minhash_dedup",
    "cosine_topk",
    "ivf_topk",
    "text_stats",
    "token_count_bpe",
    "doc_fingerprint",
    "json_extract",
    "stream_tumbling",
    "q9_product_profit",
    "q18_large_orders",
    "salted_join",
    "dedup_components",
    "decontaminate",
    "split_assign",
    "gap_fill",
    "ts_zscore",
    "kmeans_assign",
    "bm25_topk",
    "lm_perplexity",
    "zorder_cluster",
    # round-3 additions: bloom-filtered semi-join, trailing-window
    # median, time-weighted mean, triangle census
    "bloom_join",
    "rolling_median",
    "time_weighted_avg",
    "triangle_count",
    # round-4 plan rewrites (global window -> TakeOrdered / sketch
    # cuts) — benched so the fixes are measured, not just asserted
    "token_freq",
    "pareto_revenue",
    "vocab_build",
    # round-4 additions: anti-entropy digest compare, stateful EWMA
    "checksum_diff",
    "ewma_smooth",
    # round-4 wave 2: corpus-release ops, raw-file source, Python
    # surface completions
    "order_index",
    "domain_cap",
    "k_anonymity",
    "binary_ingest",
    "scalar_pandas_udf",
    "python_udtf",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    loadavg_start = os.getloadavg()
    spark = get_spark(app_name="o2o_bench", cpus=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    registry = q.all_queries()

    # Per-qid failure isolation: one broken query must cost ITS number,
    # not the whole round's bench (r2: a warmup crash produced rc=1 and
    # an empty BENCH record — a measurement outage, not a measurement).
    broken: dict[str, str] = {}

    # Warmup: run every headline query at the smallest SF first. The
    # first execution of a plan pays JVM JIT + codegen compilation for
    # its expression trees (measured: 28s cold vs 8s warm for the
    # minhash pipeline's 16-hash aggregate + higher-order shingle
    # expressions); the bench measures steady-state execution.
    for qid in HEADLINE:
        try:
            force(registry[qid](spark, "/root/testdata/sf0.001"))
        except Exception as e:
            msg = (str(e).splitlines() or [""])[0]
            broken[qid] = f"warmup: {type(e).__name__}: {msg[:200]}"
            print(f"bench: {qid} failed in warmup: {broken[qid]}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Median of 3 runs per query: this host carries heavy external load
    # (the r01 driver read 4.4x over the recorded total on identical
    # code), and a single sample cannot distinguish a real 2x
    # regression from a loadavg spike. Rounds interleave (run 1 of all
    # queries, then run 2, ...) so one load burst doesn't poison all
    # three samples of the same query.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {qid: [] for qid in HEADLINE}
    for _ in range(runs):
        for qid in HEADLINE:
            if qid in broken:
                continue
            # several operators persist shared subtrees (minhash verify,
            # merge stats) and leave them cached; 57 executions deep the
            # storage pool is full of dead entries and every query pays
            # eviction+GC. Each timed run starts from a clean cache.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                force(registry[qid](spark, SF_DIR))
            except Exception as e:
                msg = (str(e).splitlines() or [""])[0]
                broken[qid] = f"timed: {type(e).__name__}: {msg[:200]}"
                # discard partial samples: a 1-sample "median" for a qid
                # that also appears in `failed` is an ambiguous record
                samples[qid] = []
                print(f"bench: {qid} failed in timed run: {broken[qid]}", file=sys.stderr)
                continue
            samples[qid].append(time.perf_counter() - t0)

    timings: dict[str, float | None] = {
        qid: (round(sorted(ts)[len(ts) // 2], 3) if ts else None)
        for qid, ts in samples.items()
    }
    # min-of-runs alongside the median: under external load the median
    # still absorbs contention (three rounds of phantom regressions,
    # r6-r8, each adjudicated by an idle re-run) — the min is the
    # closest single number to idle-box truth, so record BOTH plus
    # loadavg stamps and let the reader judge without re-running.
    mins: dict[str, float | None] = {
        qid: (round(min(ts), 3) if ts else None) for qid, ts in samples.items()
    }
    total = round(sum(t for t in timings.values() if t is not None), 3)
    # fastest SINGLE run's total (min over runs of the per-run sum):
    # value_min sums per-query minima taken from DIFFERENT runs, so it
    # is a composite no single run achieved (ADVICE r9) — record the
    # realizable wall-clock best alongside it. Only defined when every
    # non-broken qid produced a sample in that run.
    live = [qid for qid in HEADLINE if qid not in broken]
    run_totals = [
        round(sum(samples[qid][i] for qid in live), 3)
        for i in range(runs)
        if all(len(samples[qid]) > i for qid in live)
    ]
    # dict order IS the output order (json.dumps preserves insertion):
    # big per-query maps first, scalar totals LAST, so the driver's
    # 2000-char stdout tail always captures metric/value/value_min/
    # loadavg (VERDICT r9: BENCH_r09's leading fields were truncated).
    out = {
        "queries": timings,
        "queries_min": mins,
        **({"failed": broken} if broken else {}),
        "stat": f"median_of_{runs}_interleaved",
        "sf": float(sf),
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "metric": f"headline_total_sf{sf}",
        "unit": "sec",
        "value_min_composite": round(
            sum(t for t in mins.values() if t is not None), 3
        ),
        "value_min_single_run": (min(run_totals) if run_totals else None),
        "value_min": round(sum(t for t in mins.values() if t is not None), 3),
        "value": total,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
