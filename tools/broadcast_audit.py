#!/usr/bin/env python
"""Forced-broadcast audit: for every batch qid, find every join side
the ENGINE ITSELF pinned to broadcast (an explicit ``F.broadcast()``
hint — stats-based auto-broadcasts re-decide at real scale and AQE
can demote them; a hint cannot be demoted), measure that side's row
count at sf0.01 and sf0.1, and flag hinted sides that GROW with SF.

Why: "is this join broadcast-able, and did I broadcast it?" has a
dangerous converse — a hinted broadcast of a table that scales with
the data ships the whole table to every executor and OOMs at 100 TB,
while passing every fixture-scale test. The legitimate hinted
broadcasts in this engine are SF-CONSTANT by construction: dimension
tables (25 nations), centroid/query sets, percentile cut points,
1-row scalar bounds, bitmap words. Anything else should either lose
the hint (let stats/AQE decide) or carry a whitelist entry stating
the true bound.

Flag rule: rows(sf0.1) >= GROWTH_LIMIT x rows(sf0.01) AND
rows(sf0.1) >= MIN_ROWS. Streaming qids are skipped (micro-batch
plans are not rebuildable from the status store).

    python tools/broadcast_audit.py                # exit 1 on flags
    python tools/broadcast_audit.py --qids a,b,c   # targeted
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_BC_SF_SMALL", "/root/testdata/sf0.01")
SF_BIG = os.environ.get("SPARK_GRAFT_BC_SF_BIG", "/root/testdata/sf0.1")
GROWTH_LIMIT = float(os.environ.get("BC_GROWTH_LIMIT", "3.0"))
MIN_ROWS = int(os.environ.get("BC_MIN_ROWS", "500"))

# qid -> why its growing hinted broadcast is bounded, WITH the bound
BROADCAST_WHITELIST: dict[str, str] = {
    "scd3_dimension": "the hinted side IS the CDC delta batch — the Type-3 "
    "fold's zero-exchange contract (broadcast the small delta onto the "
    "never-shuffled dimension) holds because production deltas are bounded "
    "by the feed's batch cadence, not by dimension size; the fixture "
    "derives the delta from customer so it scales with SF here",
    "decontaminate": "the hinted side is the EVAL-SET fingerprint table — "
    "fixed-size in production (an evaluation suite is a constant corpus); "
    "the fixture derives it from documents so it scales with SF here",
}


def _walk(node, out, kind):
    if node.getClass().getSimpleName() == kind:
        out.append(node)
    for i in range(node.children().size()):
        _walk(node.children().apply(i), out, kind)


def _is_broadcast_hint(opt):
    if not opt.isDefined():
        return False
    strat = opt.get().strategy()
    return strat.isDefined() and "broadcast" in strat.get().toString().lower()


def hinted_broadcast_sides(df):
    """The logical subtrees this qid's plan pins to broadcast via an
    explicit hint, in deterministic plan order (so the Nth side at one
    SF pairs with the Nth side at another)."""
    joins = []
    _walk(df._jdf.queryExecution().optimizedPlan(), joins, "Join")
    sides = []
    for j in joins:
        h = j.hint()
        if _is_broadcast_hint(h.leftHint()):
            sides.append(j.left())
        if _is_broadcast_hint(h.rightHint()):
            sides.append(j.right())
    return sides


def _count(spark, node) -> int:
    from pyspark.sql import DataFrame as PyDF

    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, node
    )
    return PyDF(jdf, spark).count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qids", default=None)
    args = ap.parse_args()
    spark = get_spark(
        app_name="o2o_broadcast_audit",
        cpus=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.all_queries()
    qids = args.qids.split(",") if args.qids else [
        k for k in reg if not k.startswith("stream_")
    ]
    flags, errs, hinted = [], [], 0
    for qid in qids:
        try:
            spark.catalog.clearCache()
            small_sides = hinted_broadcast_sides(reg[qid](spark, SF_SMALL))
            if not small_sides:
                continue
            spark.catalog.clearCache()
            big_sides = hinted_broadcast_sides(reg[qid](spark, SF_BIG))
        except Exception as e:  # noqa: BLE001 - report, don't die mid-sweep
            errs.append((qid, str(e).splitlines()[0][:120]))
            continue
        if len(small_sides) != len(big_sides):
            errs.append(
                (qid, f"hinted-side count differs across SFs "
                      f"({len(small_sides)} vs {len(big_sides)})")
            )
            continue
        hinted += len(small_sides)
        for i, (s_node, b_node) in enumerate(zip(small_sides, big_sides)):
            try:
                s_n, b_n = _count(spark, s_node), _count(spark, b_node)
            except Exception as e:  # noqa: BLE001
                errs.append((qid, f"side {i}: {str(e).splitlines()[0][:100]}"))
                continue
            if b_n >= GROWTH_LIMIT * max(s_n, 1) and b_n >= MIN_ROWS:
                if qid in BROADCAST_WHITELIST:
                    print(f"ok (whitelisted): {qid} — {BROADCAST_WHITELIST[qid]}")
                else:
                    flags.append(
                        (qid, f"hinted broadcast side {i} grows "
                              f"{s_n} -> {b_n} rows at 10x data")
                    )
    for qid, err in errs:
        print(f"ERROR {qid}: {err}")
    for qid, msg in flags:
        print(f"GROWING BROADCAST: {qid} | {msg}")
    print(
        f"swept {len(qids)} batch qids ({hinted} hinted sides); "
        f"flags={len(flags)} errors={len(errs)}"
    )
    return 1 if flags or errs else 0


if __name__ == "__main__":
    sys.exit(main())
