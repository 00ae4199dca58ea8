#!/usr/bin/env python
"""Render the round-11 before/after bench table (markdown) from two
bench JSON outputs (same box, same methodology)."""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    rows = []
    for qid, b in before["queries"].items():
        a = after["queries"].get(qid)
        if a and b:
            rows.append((qid, b, a, b / a))
    rows.sort(key=lambda r: -(r[1] - r[2]))
    print("| query | before s | after s | speedup |")
    print("|---|---|---|---|")
    for qid, b, a, s in rows:
        print(f"| {qid} | {b:.3f} | {a:.3f} | {s:.2f}x |")
    geo = math.exp(sum(math.log(s) for *_, s in rows) / len(rows))
    print()
    print(f"total (median): {before['value']} -> {after['value']} s "
          f"({before['value'] / after['value']:.2f}x); "
          f"min-composite {before['value_min_composite']} -> "
          f"{after['value_min_composite']} s; per-query geomean {geo:.2f}x")


if __name__ == "__main__":
    main()
