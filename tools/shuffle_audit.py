"""Per-qid shuffle/scan VOLUME audit — the measured complement to
tools/window_audit.py's plan-shape sweep.

For every headline qid (or an explicit list), runs the query at two
scale factors and records the actual bytes moved, from Spark's own
stage metrics (REST status API of the live UI):

- ``input_records`` — rows fed out of the file scans. Pruning /
  pushdown evidence: a qid whose scanned-row count grows faster than
  the data did lost a pushed filter. (Input BYTES are deliberately
  not used: the local-FS + vectorized-parquet input-bytes metric
  under-reports by ~100x — measured 5.9 KB reported for a 467 KB
  compressed column chunk — while record counts are exact.)
- ``shuffle_write`` — bytes written to shuffle. THE scale number: at
  100 TB the shuffle is the network; a qid whose shuffle_write ratio
  sf0.1/sf0.01 is far above the ~10x data ratio has a superlinear
  exchange (pair explosion, lost partial aggregation, broadcast that
  silently became a shuffle) that plan inspection can miss.
- ``shuffle_records`` — rows crossing the wire (write side).

Usage::

    python tools/shuffle_audit.py [--qids a,b,c] [--out docs/SHUFFLE.json]

Writes one JSON object per qid with both SFs' volumes and the ratios,
plus a markdown table to stdout. The committed snapshot lives in
docs/SHUFFLE.json / docs/SHUFFLE.md; re-run after plan changes.

Method notes: metrics come from summing completed-stage totals before
and after each qid (the UI's cumulative view), so each qid runs with a
cleared cache on a quiet session; `spark.ui.retainedStages` is raised
so eviction can't eat stages between the two snapshots. The noop sink
forces full execution without write-path noise (same as bench.py).
Ratios are volume/volume — wall-clock noise (the reason
tools/repeat_stability.py exists) does not affect them, which is what
makes this audit reproducible where timings aren't.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4099"))
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
SF_BIG = os.environ.get("SPARK_GRAFT_SF_BIG", "/root/testdata/sf0.1")
DATA_RATIO = 10.0  # sf0.1 / sf0.01


def _api(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _api("applications")[0]["id"]


def stage_totals(app_id: str) -> dict[str, int]:
    """Cumulative scan-row / shuffle-write totals over all stages."""
    tot = {"input_records": 0, "shuffle_write": 0, "shuffle_records": 0}
    for st in _api(f"applications/{app_id}/stages"):
        tot["input_records"] += st.get("inputRecords", 0)
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        tot["shuffle_records"] += st.get("shuffleWriteRecords", 0)
    return tot


def run_audit(qids: list[str], out_path: str) -> list[dict]:
    spark = get_spark(
        app_name="o2o_shuffle_audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "50000",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    registry = q.all_queries()
    app_id = _app_id()
    results = []
    for qid in qids:
        rec: dict = {"qid": qid}
        for sf_dir, tag in ((SF_SMALL, "sf0.01"), (SF_BIG, "sf0.1")):
            spark.catalog.clearCache()
            before = stage_totals(app_id)
            t0 = time.perf_counter()
            try:
                df = registry[qid](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
            except Exception as e:  # record, keep sweeping
                rec[f"{tag}_error"] = f"{type(e).__name__}: {e}"[:200]
                continue
            # REST view lags job completion by a beat; settle before
            # the 'after' snapshot so late stage updates are included
            time.sleep(0.3)
            after = stage_totals(app_id)
            rec[tag] = {
                k: after[k] - before[k] for k in before
            }
            rec[tag]["wall_s"] = round(time.perf_counter() - t0, 3)
        if "sf0.01" in rec and "sf0.1" in rec:
            for k in ("input_records", "shuffle_write"):
                small = rec["sf0.01"][k]
                big = rec["sf0.1"][k]
                rec[f"{k}_ratio"] = round(big / small, 2) if small > 0 else None
        results.append(rec)
        print(f"  {qid}: {rec.get('shuffle_write_ratio')}", file=sys.stderr)
    # MERGE into the existing record: a targeted --qids run must
    # update/append its qids, never clobber the full audit history
    # (measured rows for every other qid would silently vanish). A
    # fresh record REPLACES a prior one only when it actually carries
    # measurements — a failed rerun (port clash, timeout) must not
    # overwrite good measured evidence with an error-only stub.
    def _has_data(r: dict) -> bool:
        return "sf0.01" in r and "sf0.1" in r

    merged = results
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prior = json.load(f)
            prior_qids = {r["qid"] for r in prior}
            fresh = {r["qid"]: r for r in results}
            # _has_data gates the appended tail too: a failed FIRST
            # run of a new qid must not land a data-less stub either
            merged = [
                fresh[r["qid"]]
                if r["qid"] in fresh and _has_data(fresh[r["qid"]])
                else r
                for r in prior
            ] + [
                r
                for r in results
                if r["qid"] not in prior_qids and _has_data(r)
            ]
        except (json.JSONDecodeError, KeyError, TypeError):
            pass  # corrupt prior record: replace it
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    return results


def render_md(results: list[dict]) -> str:
    def mb(v):
        return f"{v / 1e6:.1f}"

    lines = [
        "| qid | scan rows (0.01→0.1) | ratio | shuffle-write MB (0.01→0.1) | ratio |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        if "sf0.01" not in r or "sf0.1" not in r:
            err = r.get("sf0.01_error") or r.get("sf0.1_error")
            lines.append(f"| {r['qid']} | ERROR: {err} | | | |")
            continue
        s, b = r["sf0.01"], r["sf0.1"]
        ir = r.get("input_records_ratio")
        sr = r.get("shuffle_write_ratio")
        sw_small, sw_big = s["shuffle_write"], b["shuffle_write"]
        sr_txt = "0 (no shuffle)" if sw_small == 0 and sw_big == 0 else str(sr)
        lines.append(
            f"| {r['qid']} | {s['input_records']} → {b['input_records']} | {ir} "
            f"| {mb(sw_small)} → {mb(sw_big)} | {sr_txt} |"
        )
    return "\n".join(lines)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--qids", default=None, help="comma-separated; default bench HEADLINE")
    ap.add_argument("--out", default="docs/SHUFFLE.json")
    args = ap.parse_args()
    if args.qids:
        qids = args.qids.split(",")
    else:
        import bench

        qids = list(bench.HEADLINE)
    results = run_audit(qids, args.out)
    print(render_md(results))
    flagged = [
        r["qid"]
        for r in results
        if (r.get("shuffle_write_ratio") or 0) > 3 * DATA_RATIO
    ]
    print(f"\nsuperlinear-shuffle flags (> {3 * DATA_RATIO:.0f}x): {flagged or 'none'}")


if __name__ == "__main__":
    main()
