"""Re-time specific queries with the 4-warm-pass protocol — the
arbiter for bench drift: sub-second queries jitter up to ~2× across
JVM sessions, so before a bench ratio is treated as a regression it
must reproduce as the MIN of several warm passes in one session.

Usage:
    python tools/retime.py [--sf-dir DIR] [--passes N] name [name ...]

Prints one JSON line: per-query all-pass timings, the min, and the
ratio vs the BASELINE.md row (when present).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _baseline() -> dict[str, float]:
    rows = {}
    pat = re.compile(r"^\|\s*(\w+)\s*\|\s*([0-9.]+)\s*\|")
    with open(os.path.join(ROOT, "BASELINE.md")) as fh:
        for line in fh:
            m = pat.match(line)
            if m:
                rows[m.group(1)] = float(m.group(2))
    return rows


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 4
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--passes" in argv:
        i = argv.index("--passes")
        passes = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv
    if not names:
        print("usage: retime.py [--sf-dir D] [--passes N] name ...",
              file=sys.stderr)
        return 2

    from oracle_to_cassandra_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="retime",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    qs = E.queries()
    base = _baseline()
    out = {}
    for name in names:
        samples = []
        for _ in range(passes):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        best = min(samples)
        out[name] = {
            "passes": samples,
            "min": best,
            "baseline": base.get(name),
            "ratio": round(best / base[name], 3) if name in base else None,
        }
    print(json.dumps({"metric": "retime", "sf_dir": sf_dir,
                      "queries": out}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
