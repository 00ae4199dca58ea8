#!/usr/bin/env python
"""Cross-engine parity sweep: run EVERY registered qid against its
DuckDB oracle at an arbitrary scale factor (default sf0.1 — 10× the
driver's correctness gate).

Why this exists: floating-point parity bugs are scale-dependent. Both
round-3 finds — a DECIMAL/FLOAT-typed quantization scale and a
round() half-boundary in TPC-H Q2 — were green across every sf0.01
run and only flipped a 4th/6th decimal once 10× more rows probed the
boundary. Run this after touching any oracle or double-valued
expression:

    python tools/parity_sweep.py                    # sf0.1
    python tools/parity_sweep.py /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark
from tests.duck_compare import compare, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="o2o_parity_sweep", cpus=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs, osql = q.all_queries(), q.all_oracle_sql()
    con = duck_connection(sf_dir)
    fails, skipped, checked = [], [], 0
    for qid in sorted(qs):
        if qid not in osql:
            skipped.append(qid)  # rows-only qid: nothing to compare against
            continue
        t0 = time.time()
        try:
            ok, msg = compare(qs[qid](spark, sf_dir), con, osql[qid])
        except Exception as e:  # a crash is a fail, not an abort
            ok, msg = False, f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
        print(f"{qid} {'ok' if ok else 'FAIL'} {time.time() - t0:.1f}s"
              + ("" if ok else f"  {msg[:160]}"), flush=True)
        checked += 1
        if not ok:
            fails.append(qid)
    # checked counts COMPARED qids only — a rows-only qid must show up
    # as skipped, never be silently folded into the green count
    print(
        f"checked {checked}/{len(qs)} qids at {sf_dir}: {len(fails)} fails {fails}"
        + (f"; skipped (no oracle): {skipped}" if skipped else "")
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
