"""Append post-freeze baseline rows to BASELINE.md from
BENCH_LOCAL.json (the full record bench.py persists).

BASELINE.md is FROZEN (round 3): existing per-query rows are the
permanent regression anchor and are NEVER rewritten — a self-refreshed
baseline would make the 2× bar self-referential. This tool now only
APPENDS rows for queries that have no baseline entry yet (new operators
added after the freeze), taking each new query's number from its first
green bench run.

Usage: python bench.py && python tools/record_baseline.py
"""

from __future__ import annotations

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK = "| query | sec/query @ sf0.1 |"
ADDENDUM_MARK = "## Post-freeze additions"


def main() -> None:
    with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as fh:
        payload = json.load(fh)
    queries = payload["queries"]
    path = os.path.join(ROOT, "BASELINE.md")
    with open(path) as fh:
        text = fh.read()

    # rows may carry a third provenance cell ("| name | t | r6 ... |");
    # anchoring to end-of-line would silently re-append (= rebase) them
    existing = set(re.findall(r"^\| (\w+) \| [\d.]+ \|", text, re.M))
    new = sorted(set(queries) - existing)
    if not new:
        print(f"baseline frozen; all {len(queries)} benched queries already "
              "have rows — nothing to append")
        return

    if ADDENDUM_MARK not in text:
        text = text.rstrip("\n") + (
            f"\n\n{ADDENDUM_MARK}\n\nQueries added after the round-3 freeze; "
            "each row records the query's FIRST green bench run and then "
            "never changes.\n\n" + MARK + "\n|---|---|\n"
        )
    import datetime
    stamp = datetime.date.today().isoformat()
    rows = "".join(f"| {name} | {queries[name]} | first-green {stamp} |\n"
                   for name in new)
    with open(path, "w") as fh:
        fh.write(text.rstrip("\n") + "\n" + rows)
    print(f"appended {len(new)} post-freeze rows: {', '.join(new)}")


if __name__ == "__main__":
    main()
