"""Run the ENTIRE stress campaign in one command: build every
invariant-breaking dataset (tools/make_stress_data.py modes) and
differentially sweep the full oracled surface on each
(tools/sf_sweep.py), writing one report per axis plus a one-line
rollup.

This is the regression harness for the 47 cross-engine divergences
round 8 found and fixed (NULL semantics, empty/single-row knife
edges, JVM case-fold SpecialCasing, duplicate-timestamp ties, …):
any future query or oracle change that re-introduces one of those
classes fails the corresponding axis loudly.

Usage:
    python tools/stress_all.py [--modes m1,m2,...] [--src SF_DIR]

Each axis writes <MODE>_SWEEP.json at the repo root (same names the
round-8 artifacts use; EMPTY/TINY/... ). Exit code 1 if any axis has
failures. Budget ~45 min for the full campaign at the default sf0.1
source (the gauntlet and skew axes dominate).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: mode -> (dataset dir name, report filename)
AXES = {
    "shift": ("stress", "STRESS_SWEEP.json"),
    "skew": ("stress_skew", "SKEW_SWEEP.json"),
    "null": ("stress_null", "NULL_SWEEP.json"),
    "empty": ("stress_empty", "EMPTY_SWEEP.json"),
    "tiny": ("stress_tiny", "TINY_SWEEP.json"),
    "unicode": ("stress_unicode", "UNICODE_SWEEP.json"),
    "temporal": ("stress_temporal", "TEMPORAL_SWEEP.json"),
    "gauntlet": ("stress_gauntlet", "GAUNTLET_SWEEP.json"),
    "longdoc": ("stress_longdoc", "LONGDOC_SWEEP.json"),
    "bigvec": ("stress_bigvec", "BIGVEC_SWEEP.json"),
}


def _registered_oracled() -> set[str]:
    """Names of every registered DuckDB-oracled query (import-only —
    no SparkSession is started). Computed once per campaign: the
    registry is fixed for the process lifetime."""
    if ROOT not in sys.path:
        sys.path.insert(0, ROOT)
    from oracle_to_cassandra_spark import registry

    registry.load_all()
    return set(registry.ORACLE)


def main() -> int:
    argv = sys.argv[1:]
    modes = list(AXES)
    env = dict(os.environ)
    if "--modes" in argv:
        modes = argv[argv.index("--modes") + 1].split(",")
    if "--src" in argv:
        env["STRESS_SRC"] = argv[argv.index("--src") + 1]

    oracled = _registered_oracled()
    rollup = {}
    failed_axes = []
    for mode in modes:
        dirname, report = AXES[mode]
        t0 = time.time()
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "make_stress_data.py"),
             "--mode", mode],
            check=True, env=env, cwd=ROOT,
            stdout=subprocess.DEVNULL,
        )
        # delete the axis report BEFORE the sweep: if the subprocess
        # dies without writing one (build error, OOM), json.load must
        # fail loudly rather than silently roll up a stale prior run
        report_path = os.path.join(ROOT, report)
        if os.path.exists(report_path):
            os.remove(report_path)
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "sf_sweep.py"),
             os.path.join(ROOT, ".scratch", dirname), "--out", report],
            env=env, cwd=ROOT,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        if not os.path.exists(report_path):
            print(f"CRASH {mode}: sweep exited {proc.returncode} without "
                  f"writing {report}", file=sys.stderr)
            rollup[mode] = {"pass": 0, "fail": -1, "sec": round(
                time.time() - t0, 1), "failures": ["<sweep crashed>"]}
            failed_axes.append(mode)
            continue
        loaded = json.load(open(report_path))
        summary = loaded["summary"]
        # every axis must cover the FULL registered oracled surface —
        # a report missing queries (sweep-list lag, partial rerun)
        # would otherwise roll up as green while never exercising the
        # absent oracles on this axis (r9 ADVICE finding)
        missing = oracled - set(loaded["queries"])
        if missing:
            print(f"INCOMPLETE {mode}: report lacks {len(missing)} "
                  f"registered queries, e.g. {sorted(missing)[:5]}",
                  file=sys.stderr)
            rollup[mode] = {"pass": summary["n_pass"], "fail": -1,
                            "sec": round(time.time() - t0, 1),
                            "failures": [f"<missing:{n}>"
                                         for n in sorted(missing)]}
            failed_axes.append(mode)
            continue
        rollup[mode] = {
            "pass": summary["n_pass"],
            "fail": summary["n_fail"],
            "sec": round(time.time() - t0, 1),
            "failures": summary["failures"],
        }
        status = "OK " if proc.returncode == 0 else "FAIL"
        print(f"{status} {mode:9s} {summary['n_pass']}/"
              f"{summary['n_pass'] + summary['n_fail']} "
              f"({rollup[mode]['sec']}s)", file=sys.stderr)
        if proc.returncode != 0:
            failed_axes.append(mode)

    print(json.dumps({
        "metric": "stress_campaign",
        "axes": rollup,
        "failed_axes": failed_axes,
    }, separators=(",", ":")))
    return 1 if failed_axes else 0


if __name__ == "__main__":
    sys.exit(main())
