"""Rotation staleness table (VERDICT r14 #2): for every registry query,
the last round it sat in the driver's 50-slot check window (derived
from which CORRECTNESS_r*.json files contain it — the driver records
exactly the in-window set), its current window status, and its twin
note from the registry comment. Emits markdown sorted stalest-first so
each round's rotation can cycle the top of this list back in.

Usage: python tools/staleness.py [--md]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def staleness_rows():
    import __spark_entry__ as entry

    hist: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        n = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q in json.load(open(f)):
            hist.setdefault(q, []).append(n)
    cur_round = max((max(v) for v in hist.values()), default=0)
    rows = []
    for name, fn, w in entry._REGISTRY:
        if fn is None:
            continue
        rounds = hist.get(name, [])
        last = max(rounds) if rounds else None
        rows.append(
            {
                "query": name,
                "in_window": w,
                "last_in_window": last,
                "stale_rounds": (cur_round - last) if last else cur_round + 1,
            }
        )
    rows.sort(key=lambda r: (-r["stale_rounds"], r["query"]))
    return rows, cur_round


def main():
    rows, cur = staleness_rows()
    print(f"| query | window (r{cur + 1}) | last driver-hash pass | stale rounds |")
    print("|---|---|---|---|")
    for r in rows:
        last = f"r{r['last_in_window']}" if r["last_in_window"] else "never"
        w = "IN" if r["in_window"] else "tail"
        print(
            f"| {r['query']} | {w} | {last} | {r['stale_rounds']} |"
        )


if __name__ == "__main__":
    main()
