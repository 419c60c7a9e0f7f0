"""Evidence-ledger report: per-query freshest driver evidence and the
current rotation state — the input every round's window rotation
(registry._WINDOW/_QUEUE) is composed from.

Derives freshness from the committed CORRECTNESS_r*.json files (a
query's evidence round = the newest file with a fully-green row:
rows+schema+hash, or rows+schema for rows-only contracts) and prints:

  * the freshness distribution over live registered queries,
  * the current window's composition by evidence round,
  * the staged queue vs the actual stalest tail (mismatches = the
    arithmetic drift the r9 ADVICE caught),
  * zero-evidence live queries (must be in the window).

Usage:
    python tools/evidence_ledger.py            # summary
    python tools/evidence_ledger.py --list rN  # names at round N
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def freshest() -> dict[str, int]:
    fresh: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            ):
                fresh[q] = max(rnd, fresh.get(q, 0))
    return fresh


def main() -> int:
    from oracle_to_cassandra_spark import registry

    registry.load_all()
    live = set(registry.QUERIES)
    window, queue = list(registry._WINDOW), list(registry._QUEUE)
    fresh = freshest()

    if "--list" in sys.argv:
        want = int(sys.argv[sys.argv.index("--list") + 1].lstrip("r"))
        for q in sorted(q for q in live if fresh.get(q) == want):
            print(q)
        return 0

    dist = Counter(fresh.get(q, 0) for q in live)
    window_dist = Counter(fresh.get(q, 0) for q in window)
    outside = {q: fresh.get(q, 0) for q in live - set(window)}
    oldest = min(outside.values()) if outside else None
    stalest = sorted(q for q, r in outside.items() if r == oldest)
    print(json.dumps({
        "live_queries": len(live),
        "freshness_dist": {f"r{k}": v for k, v in sorted(dist.items())},
        "window_dist": {f"r{k}": v for k, v in sorted(window_dist.items())},
        "oldest_outside_window": f"r{oldest}" if oldest is not None else None,
        "stalest_tail_n": len(stalest),
        "stalest_not_in_queue": sorted(set(stalest) - set(queue)),
        "queue_not_stalest": sorted(set(queue) - set(stalest)),
        "zero_evidence_outside_window": sorted(
            live - set(window) - set(fresh)
        ),
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
