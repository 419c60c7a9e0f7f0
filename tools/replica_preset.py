"""Judge-replica preset: reproduce the per-round independent replica
the r12 verdict ran by hand — a named list of NON-window queries
verified under the driver's bare session — from the committed
artifacts instead of a hand-typed list.

Selection (mirrors the judge's r12 composition):
  * the K most expensive queries in the newest ``BENCH_r*.json``
    (default 5) — the rows where a silent plan regression costs most;
  * every query whose newest bench time exceeds ``--ratio`` (default
    1.25) × its frozen ``BASELINE.md`` row — the drift watchlist;
  * the M queries with the STALEST external driver evidence that are
    NOT already staged in the current window or queue (default 8) —
    the freshness tail the rotation hasn't reached yet;
  * any extra names passed on the command line.

Window queries are excluded — the driver itself certifies those each
round; the preset exists to double-check what the window does NOT.

Usage:
    python tools/replica_preset.py            # print the target list
    python tools/replica_preset.py --run      # run driver_replica on it
    python tools/replica_preset.py --run extra_query_name ...
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TOP_EXPENSIVE = 5
STALE_TAIL = 8
RATIO_BAR = 1.25


def _newest_bench() -> dict[str, float]:
    files = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not files:
        return {}
    text = open(files[-1]).read()
    # the artifact elides most queries in its top-level dict but keeps
    # the full map in the embedded tail / BENCH_LOCAL.json — regex
    # over the raw text sees every "name":sec pair in either layout
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(
            r'"([a-z0-9_]+)\\?":\s*([0-9]+\.[0-9]+)', text
        )
    }


def _baseline_rows() -> dict[str, float]:
    rows: dict[str, float] = {}
    path = os.path.join(ROOT, "BASELINE.md")
    if not os.path.exists(path):
        return rows
    for line in open(path):
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
        if m:
            rows[m.group(1)] = float(m.group(2))
    return rows


def targets(extra: list[str]) -> list[str]:
    from oracle_to_cassandra_spark import registry

    registry.load_all()
    live = set(registry.QUERIES)
    staged = set(registry._WINDOW) | set(registry._QUEUE)
    window = set(registry._WINDOW)

    bench = {q: s for q, s in _newest_bench().items() if q in live}
    base = _baseline_rows()

    picks: list[str] = []

    expensive = sorted(bench, key=bench.get, reverse=True)
    picks += [q for q in expensive if q not in window][:TOP_EXPENSIVE]

    for q, sec in bench.items():
        if q in window or q not in base:
            continue
        if base[q] > 0 and sec / base[q] >= RATIO_BAR:
            picks.append(q)

    from tools.evidence_ledger import freshest

    fresh = freshest()
    stale = sorted(
        (q for q in live if q not in staged),
        key=lambda q: (fresh.get(q, 0), q),
    )
    picks += stale[:STALE_TAIL]

    picks += [e for e in extra if e in live]
    seen: set[str] = set()
    return [q for q in picks if not (q in seen or seen.add(q))]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = targets(args)
    if "--run" not in sys.argv:
        print("\n".join(names))
        return 0
    cmd = [
        sys.executable,
        os.path.join(ROOT, "tools", "driver_replica.py"),
        "/root/testdata/sf0.01",
        *names,
    ]
    return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())
