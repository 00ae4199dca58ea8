#!/usr/bin/env python
"""Partition-key skew audit: for every batch qid, measure the TOP-KEY
SHARE of every shuffle consumer that materializes WHOLE GROUPS —
equi-join sides, Window partition keys, and non-reducing aggregates
(collect_list/collect_set/listagg/pandas UDAFs) — and flag hot keys
that would pin a 100 TB shuffle onto one reducer. Reducing aggregates
(sum/count/min/...) are exempt by design: map-side partials collapse
a hot key into one row per task before the shuffle.

Why: a shuffle's wall-clock at scale is its HOTTEST partition, not its
byte total — a join key where one value holds 40% of rows runs at 1x
parallelism no matter how many executors exist. The shuffle audit
measures volume (blind to distribution), the window audit measures key
CARDINALITY (a 1M-key exchange can still have one hot key), and plan
gates see shapes, not data. This audit walks the optimized logical
plan (the same Dataset.ofRows machinery as window_audit matcher 3),
evaluates each node's INPUT subtree at sf0.01, and computes
share = max per-key count / total rows.

Flag rule: share >= SHARE_LIMIT (default 0.25) AND total >= MIN_ROWS
(default 5000 — tiny inputs are all-share by arithmetic; a 25-nation
dimension legitimately has ~4% per key and a 3-row input is 33%
by construction). Whitelist entries state why the hot key is safe
(bounded input, deliberate skew demo, broadcast side).

    python tools/skew_audit.py                  # exit 1 on flags
    python tools/skew_audit.py --qids a,b,c     # targeted
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SKEW_SF_DIR", "/root/testdata/sf0.01")
SHARE_LIMIT = float(os.environ.get("SKEW_SHARE_LIMIT", "0.25"))
MIN_ROWS = int(os.environ.get("SKEW_MIN_ROWS", "5000"))

# qid -> why its hot key is acceptable, WITH the stated bound/reason.
# (salted_join needs no entry: its join key INCLUDES the salt, so the
# measured share is already the post-salt 1/8 — the salt working is
# exactly what this audit observes.)
SKEW_WHITELIST: dict[str, str] = {
    "weighted_median": "the hot window key (l_returnflag, 33%) runs over "
    "the (flag, cents) HISTOGRAM, whose size saturates at the integer-cents "
    "domain (~10.4M rows) regardless of SF — the hot partition is bounded, "
    "not proportional to lineitem",
    "pandas_grouped_agg": "the 5-segment grouped pandas UDAF is the "
    "DOCUMENTED anti-pattern arm of the §2.10 surface (bounded-group-"
    "cardinality contract in its docstring); below the row floor at fixture "
    "scale but listed so a larger fixture cannot silently flag it",
}


def _walk(node, out, kinds):
    if node.getClass().getSimpleName() in kinds:
        out.append(node)
    for i in range(node.children().size()):
        _walk(node.children().apply(i), out, kinds)


# optimizer-inserted wrappers whose .sql() spelling is not re-parseable
_WRAPPERS = {"KnownFloatingPointNormalized", "NormalizeNaNAndZero"}


def _unwrap(e):
    while e.getClass().getSimpleName() in _WRAPPERS:
        e = e.child()
    return e


def _walk_has(node, kind):
    if node.getClass().getSimpleName() == kind:
        return True
    for i in range(node.children().size()):
        if _walk_has(node.children().apply(i), kind):
            return True
    return False


def _has_loop_ref(node):
    """True if the subtree contains a recursive-CTE loop reference —
    such a subtree cannot be evaluated standalone via Dataset.ofRows
    (it only has data inside the UnionLoop fixpoint)."""
    if node.getClass().getSimpleName() in {"UnionLoopRef", "CTERelationRef"}:
        return True
    for i in range(node.children().size()):
        if _has_loop_ref(node.children().apply(i)):
            return True
    return False


def _join_keys(join):
    """([left-side keys], [right-side keys]) of the equi part, or
    ([], []) for non-equi. Each EqualTo's exprs are assigned to a side
    by REFERENCE CONTAINMENT against the children's output sets — the
    optimizer does NOT guarantee positional alignment (q5's plan
    carries EqualTo(o_custkey, c_custkey) AND
    EqualTo(c_nationkey, s_nationkey) in one condition, sides
    crossed). Pairs that resolve to neither side (correlated refs)
    are dropped."""
    cond = join.condition()
    if not cond.isDefined():
        return [], []
    eqs = []

    def split(expr):
        name = expr.getClass().getSimpleName()
        if name == "And":
            split(expr.left())
            split(expr.right())
        elif name == "EqualTo":
            eqs.append((_unwrap(expr.left()), _unwrap(expr.right())))

    split(cond.get())
    lout, rout = join.left().outputSet(), join.right().outputSet()
    lefts, rights = [], []
    for a, b in eqs:
        if a.references().subsetOf(lout) and b.references().subsetOf(rout):
            lefts.append(a)
            rights.append(b)
        elif b.references().subsetOf(lout) and a.references().subsetOf(rout):
            lefts.append(b)
            rights.append(a)
    return lefts, rights


def _share(spark, child, key_sql_variants):
    """(top-key count, total rows) for the key tuple over the child
    subtree — one aggregation job. Tries each spelling in
    key_sql_variants (own side first, then the other side, then
    unqualified) until one resolves."""
    from pyspark.sql import DataFrame as PyDF
    from pyspark.sql import functions as F

    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, child
    )
    df = PyDF(jdf, spark)
    proj, last = None, None
    for sqls in key_sql_variants:
        try:
            proj = df.selectExpr(*sqls)
            break
        except Exception as e:  # noqa: BLE001 - try the next spelling
            last = e
    if proj is None:
        raise last
    counts = proj.groupBy(*proj.columns).count()
    row = counts.agg(
        F.max("count").alias("top"), F.sum("count").alias("total")
    ).collect()[0]
    return int(row["top"] or 0), int(row["total"] or 0)


# aggregate functions that ship whole groups through the shuffle —
# the ONLY aggregates where key skew hurts. Reducing aggregates
# (sum/count/min/max/avg/bit_or/...) collapse map-side into one
# partial per (task, key), so a hot key costs nothing extra: TPC-H Q1
# groups 600k lineitem rows into 4 groups and is the CANONICAL
# combinable aggregation, not a skew bug.
_NON_REDUCING = {"CollectList", "CollectSet", "ListAgg"}


def _has_non_reducing_agg(node):
    found = []

    def walk_expr(e):
        name = e.getClass().getSimpleName()
        if name in _NON_REDUCING or "Python" in name:
            found.append(name)
        for i in range(e.children().size()):
            walk_expr(e.children().apply(i))

    aes = node.aggregateExpressions()
    for i in range(aes.size()):
        walk_expr(aes.apply(i))
    return bool(found)


def hot_keys(spark, df, share_limit=SHARE_LIMIT, min_rows=MIN_ROWS):
    """[(node_kind, key_sqls, top, total)] for every whole-group
    shuffle consumer — equi-Join sides, Window partition keys, and
    NON-REDUCING Aggregates — whose input exceeds min_rows and whose
    hottest key holds >= share_limit of it; plus unevaluable probes
    as errors."""
    hits, errors, seen = [], [], set()
    plan = df._jdf.queryExecution().optimizedPlan()
    if _has_loop_ref(plan) or _walk_has(plan, "UnionLoop"):
        # recursive-CTE fixpoint: per-iteration subtrees have no
        # standalone data to probe — skip the qid, loudly
        print("skipped (recursive-CTE fixpoint plan): no standalone subtrees")
        return hits, errors
    nodes = []
    _walk(plan, nodes, {"Join", "Aggregate", "Window"})
    for node in nodes:
        kind = node.getClass().getSimpleName()
        if kind == "Join":
            lefts, rights = _join_keys(node)
            if not lefts:
                continue
            lsql = tuple(k.sql() for k in lefts)
            rsql = tuple(k.sql() for k in rights)
            sides = [
                (node.left(), [lsql]),
                (node.right(), [rsql]),
            ]
        elif kind == "Window":
            ps = node.partitionSpec()
            keys = [_unwrap(ps.apply(i)) for i in range(ps.size())]
            if not keys:
                continue  # global windows are window_audit matcher 1's job
            ksql = tuple(k.sql() for k in keys)
            sides = [(node.child(), [ksql])]
        else:
            if not _has_non_reducing_agg(node):
                continue  # combinable: map-side partials absorb skew
            ge = node.groupingExpressions()
            keys = [_unwrap(ge.apply(i)) for i in range(ge.size())]
            if not keys:
                continue
            ksql = tuple(k.sql() for k in keys)
            sides = [(node.child(), [ksql])]
        for child, variants in sides:
            if _has_loop_ref(child):
                continue  # recursive-CTE loop body: no standalone data
            # last-resort spelling: strip qualifiers (see window_audit)
            variants = variants + [
                tuple(s.rsplit(".", 1)[-1] for s in variants[0])
            ]
            sig = (variants[0], child.semanticHash())
            if sig in seen:
                continue
            seen.add(sig)
            try:
                top, total = _share(spark, child, variants)
            except Exception as e:  # noqa: BLE001 - surface, don't hide
                errors.append((kind, variants[0], str(e).splitlines()[0][:120]))
                continue
            if total >= min_rows and top >= share_limit * total:
                hits.append((kind, variants[0], top, total))
    return hits, errors


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qids", default=None)
    args = ap.parse_args()
    spark = get_spark(
        app_name="o2o_skew_audit",
        cpus=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from oracle_to_oracle_data_integration_pipeline_spark.queries.streaming_queries import (
        BATCH_TWIN_BUILDERS,
        batch_twin,
    )

    reg = q.all_queries()
    # streaming qids probe through their batch twins (fidelity pinned
    # by tests/test_stream_batch_twins.py); stream qids without a twin
    # stay exempt (documented in docs/SCALING.md)
    for twin_qid in BATCH_TWIN_BUILDERS:
        reg[f"{twin_qid}[twin]"] = (
            lambda s, d, _q=twin_qid: batch_twin(s, d, _q)
        )
    qids = args.qids.split(",") if args.qids else [
        k for k in reg if not k.startswith("stream_") or k.endswith("[twin]")
    ]
    flags, errs = [], []
    for qid in qids:
        try:
            spark.catalog.clearCache()
            df = reg[qid](spark, SF_DIR)
            hits, herrs = hot_keys(spark, df)
        except Exception as e:  # noqa: BLE001 - report, don't die mid-sweep
            errs.append((qid, str(e).splitlines()[0][:120]))
            continue
        for kind, keys, kerr in herrs:
            errs.append((qid, f"probe failed {kind} {keys}: {kerr}"))
        if hits and qid not in SKEW_WHITELIST:
            kind, keys, top, total = hits[0]
            flags.append(
                (qid, f"{kind} key {keys}: top key holds {top}/{total} rows "
                      f"({100.0 * top / total:.0f}%)")
            )
        elif hits:
            print(f"ok (whitelisted): {qid} — {SKEW_WHITELIST[qid]}")
    for qid, err in errs:
        print(f"ERROR {qid}: {err}")
    for qid, msg in flags:
        print(f"HOT KEY: {qid} | {msg}")
    print(f"swept {len(qids)} batch qids; flags={len(flags)} errors={len(errs)}")
    return 1 if flags or errs else 0


if __name__ == "__main__":
    sys.exit(main())
