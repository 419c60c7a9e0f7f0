"""Rewrite the per-query baseline table in BASELINE.md from
BENCH_LOCAL.json (the full record bench.py persists).

Usage: python bench.py && python tools/record_baseline.py

Methodology note recorded alongside: the baseline MUST come from a
fresh JVM running bench.py alone (alphabetical order, noop sink) —
the same way the grading driver runs it — or the 2× regression bar
compares warm-cache numbers against cold ones.
"""

from __future__ import annotations

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK = "| query | sec/query @ sf0.1 |"


def main() -> None:
    with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as fh:
        payload = json.load(fh)
    queries = payload["queries"]
    with open(os.path.join(ROOT, "BASELINE.md")) as fh:
        text = fh.read()

    head = text.split(MARK)[0]
    lines = [MARK, "|---|---|"]
    for name in sorted(queries):
        lines.append(f"| {name} | {queries[name]} |")
    lines.append(
        f"\n**Total: {payload['value']} s / {len(queries)} queries at "
        f"sf{payload['sf']}** — fresh JVM, `python bench.py` alone on the "
        "machine (alphabetical order, noop sink, local[32], AQE on, "
        "per-query min of 2 passes), the same methodology the driver's "
        "per-round bench uses — bench.py itself implements min-of-2, so "
        "recorded baseline and graded bench stay comparable.\n"
    )
    with open(os.path.join(ROOT, "BASELINE.md"), "w") as fh:
        fh.write(head + "\n".join(lines))
    print(f"recorded {len(queries)} queries, total {payload['value']}s")


if __name__ == "__main__":
    main()
