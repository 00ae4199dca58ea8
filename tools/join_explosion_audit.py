#!/usr/bin/env python
"""Join-explosion audit: count the OUTPUT rows of every Join node in
every batch qid's optimized plan at sf0.01 and sf0.1, and flag joins
whose output grows superlinearly in the data.

Why: this is the hazard class every other audit is blind to. Round 6
shipped quantile_normalize joining on nation alone with the rank-index
match as a post-join filter — |customers_n| x |suppliers_n| pairs per
nation, quadratic in SF — and the verdict noted it was invisible in
shuffle bytes (linear), exchange counts (2, as designed), AND the plan
gates (shapes fine). The quadratic lived in the JOIN OUTPUT
cardinality, which nothing measured. This audit measures exactly
that: out(sf0.1) / out(sf0.01) >= RATIO_LIMIT (default 30 — well
above the 10x data growth; a linear join measures ~10, a quadratic
~100) with out(sf0.1) >= MIN_ROWS flags the node. MEASURED against
the old quantile_normalize shape: its nation-only join outputs
5,949 rows at sf0.01 and 598,990 at sf0.1 — 101x, textbook
quadratic — while the fixed index equi-join measures exactly 10x.

Whitelist entries state why a superlinear join is bounded (canopy/
band/cell-bounded candidate pairs whose quadratic term saturates, or
deliberate small cross products).

    python tools/join_explosion_audit.py                # exit 1 on flags
    python tools/join_explosion_audit.py --qids a,b,c   # targeted
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark
from tools.skew_audit import _has_loop_ref, _walk_has

SF_SMALL = os.environ.get("SPARK_GRAFT_JX_SF_SMALL", "/root/testdata/sf0.01")
SF_BIG = os.environ.get("SPARK_GRAFT_JX_SF_BIG", "/root/testdata/sf0.1")
RATIO_LIMIT = float(os.environ.get("JX_RATIO_LIMIT", "30.0"))
MIN_ROWS = int(os.environ.get("JX_MIN_ROWS", "5000"))

# qid -> why its superlinear join output is bounded, WITH the bound
EXPLOSION_WHITELIST: dict[str, str] = {
    "ngram_jaccard": "the EXACT inverted-index baseline arm: sum freq(s)^2 "
    "is the definition of all-pairs shingle Jaccard (operators/dedup.py "
    "documents it as 'the quadratic the LSH path exists to avoid'); the "
    "production paths are minhash_dedup's banded LSH (measured linear by "
    "this audit) and the max_shingle_df posting cap",
    "dedup_keep_best": "reuses the exact ngram_jaccard pair set as its "
    "survivorship input — same definitional exact arm; production keeps "
    "best over LSH candidates",
    "minhash_estimate_audit": "the AUDIT arm by construction: it compares "
    "the LSH estimate against the exact pair set, so it must compute the "
    "exact quadratic — run at sampled scale in production",
    "record_linkage": "banded blocking on (nation, acctbal band) has a "
    "CONSTANT block count (~275), so the pair space is |A||B|/275 — "
    "quadratic with a small constant; the qid demonstrates Fellegi-Sunter "
    "scoring + the precision audit, and its docstring documents the "
    "production discipline (union of SELECTIVE blocking passes whose keys "
    "scale with entity count: name/email/phone)",
    "decontaminate": "train x eval n-gram matches: the eval side is a "
    "FIXED corpus in production (an evaluation suite), fixture-derived "
    "here so both sides grow; the same contract as its broadcast-audit "
    "whitelist entry",
}


def _joins(df):
    out = []

    def walk(node):
        if node.getClass().getSimpleName() == "Join":
            out.append(node)
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def _count(spark, node) -> int:
    from pyspark.sql import DataFrame as PyDF

    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, node
    )
    return PyDF(jdf, spark).count()


def join_growth(spark, fn, ratio_limit=RATIO_LIMIT, min_rows=MIN_ROWS):
    """[(join_idx, out_small, out_big)] for joins whose output grows
    past ratio_limit; pairs the Nth join at one SF with the Nth at the
    other (same query text -> same optimized join order)."""
    df_small = fn(spark, SF_SMALL)
    if _has_loop_ref(df_small._jdf.queryExecution().optimizedPlan()) or _walk_has(
        df_small._jdf.queryExecution().optimizedPlan(), "UnionLoop"
    ):
        print("skipped (recursive-CTE fixpoint plan)")
        return [], []
    j_small = _joins(df_small)
    if not j_small:
        return [], []
    spark.catalog.clearCache()
    j_big = _joins(fn(spark, SF_BIG))
    if len(j_small) != len(j_big):
        return [], [f"join count differs across SFs ({len(j_small)} vs {len(j_big)})"]
    hits, errors = [], []
    for i, (a, b) in enumerate(zip(j_small, j_big)):
        try:
            small, big = _count(spark, a), _count(spark, b)
        except Exception as e:  # noqa: BLE001 - surface, don't hide
            errors.append(f"join {i}: {str(e).splitlines()[0][:110]}")
            continue
        if big >= min_rows and big >= ratio_limit * max(small, 1):
            hits.append((i, small, big))
    return hits, errors


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qids", default=None)
    args = ap.parse_args()
    spark = get_spark(
        app_name="o2o_jx_audit",
        cpus=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from oracle_to_oracle_data_integration_pipeline_spark.queries.streaming_queries import (
        BATCH_TWIN_BUILDERS,
        batch_twin,
    )

    reg = q.all_queries()
    # streaming qids probe through their batch twins (see skew_audit)
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
            hits, herrs = join_growth(spark, reg[qid])
        except Exception as e:  # noqa: BLE001 - report, don't die mid-sweep
            errs.append((qid, str(e).splitlines()[0][:120]))
            continue
        for h in herrs:
            errs.append((qid, h))
        if hits and qid not in EXPLOSION_WHITELIST:
            i, small, big = hits[0]
            flags.append(
                (qid, f"join {i} output grows {small} -> {big} rows "
                      f"({big / max(small, 1):.0f}x) under 10x data")
            )
        elif hits:
            print(f"ok (whitelisted): {qid} — {EXPLOSION_WHITELIST[qid]}")
    for qid, err in errs:
        print(f"ERROR {qid}: {err}")
    for qid, msg in flags:
        print(f"JOIN EXPLOSION: {qid} | {msg}")
    print(f"swept {len(qids)} batch qids; flags={len(flags)} errors={len(errs)}")
    return 1 if flags or errs else 0


if __name__ == "__main__":
    sys.exit(main())
