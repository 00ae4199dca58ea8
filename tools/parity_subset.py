#!/usr/bin/env python
"""Oracle-parity check for an explicit qid subset — the fast inner-loop
companion of parity_sweep.py (same compare, same fixtures), for
verifying the qids a change touches before paying for a full sweep.

    python tools/parity_subset.py sf0.01 qid [qid ...]
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
    sf = sys.argv[1]
    sf_dir = sf if os.path.isdir(sf) else f"/root/testdata/{sf}"
    qids = sys.argv[2:]
    spark = get_spark(app_name="o2o_parity_subset", cpus=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs, osql = q.all_queries(), q.all_oracle_sql()
    con = duck_connection(sf_dir)
    fails = []
    for qid in qids:
        t0 = time.time()
        try:
            ok, msg = compare(qs[qid](spark, sf_dir), con, osql[qid])
        except Exception as e:
            ok, msg = False, f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
        print(f"{qid} {'ok' if ok else 'FAIL'} {time.time() - t0:.1f}s"
              + ("" if ok else f"  {msg[:200]}"), flush=True)
        if not ok:
            fails.append(qid)
    print(f"subset: {len(qids) - len(fails)}/{len(qids)} ok; fails {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
