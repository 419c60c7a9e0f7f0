"""Full-surface differential sweep at an arbitrary scale factor.

Runs EVERY registered oracled query (Spark on local[N]) against its
DuckDB oracle over the same parquet dir and reports mismatches — the
same normalize-and-compare the per-session replica uses
(``tests/compare.py``), but at a chosen SF.  The per-session pytest
replica pins sf0.001; the driver window covers 50 queries at sf0.01;
this tool is the third leg: the pre-commit sf0.1 sweep that catches
scale-dependent cross-engine flakes (the ``round(SUM(float))`` family
was caught exactly this way in round 7) on the FULL surface.

Usage:
    python tools/sf_sweep.py [sf_dir] [name_substring ...]
    python tools/sf_sweep.py [sf_dir] --slice I:J   # queries [I, J) of
                                                    # the sorted oracle
                                                    # list (chunked runs
                                                    # under a per-process
                                                    # wall-clock cap)
    python tools/sf_sweep.py [sf_dir] --out F.json  # report filename
                                                    # (e.g. the stress
                                                    # dataset's report)

Writes a one-line JSON summary to stdout and a full per-query report
to SWEEP_LOCAL.json (--slice merges into the existing report instead
of overwriting, so chunked runs accumulate one file).  Exit code 1 on
any mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rest = sys.argv[2:]
    sl = None
    out_name = "SWEEP_LOCAL.json"
    while rest and rest[0] in ("--slice", "--out"):
        if rest[0] == "--slice":
            i, j = rest[1].split(":")
            sl, rest = (int(i), int(j)), rest[2:]
        else:
            out_name, rest = rest[1], rest[2:]
    only = rest

    from oracle_to_cassandra_spark.session import get_spark
    from tests.compare import compare_query
    from tests.conftest import make_duckdb

    import __spark_entry__ as E

    spark = get_spark(app_name="sf-sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    con = make_duckdb(sf_dir)

    qs = E.queries()
    oracles = E.oracle_sql()
    names = [n for n in sorted(oracles) if not only or any(s in n for s in only)]
    if sl is not None:
        names = names[sl[0] : sl[1]]

    report: dict[str, dict] = {}
    n_pass = n_fail = 0
    t_start = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            compare_query(qs[name](spark, sf_dir), con, oracles[name], name=name)
            report[name] = {"ok": True, "sec": round(time.time() - t0, 2)}
            n_pass += 1
        except Exception as exc:  # noqa: BLE001 - report and continue
            report[name] = {
                "ok": False,
                "sec": round(time.time() - t0, 2),
                "err": str(exc)[:500],
            }
            n_fail += 1
            print(f"FAIL {name}: {str(exc)[:200]}", file=sys.stderr)
        if (i + 1) % 25 == 0:
            print(
                f"... {i + 1}/{len(names)} ({n_fail} fail, "
                f"{round(time.time() - t_start)}s)",
                file=sys.stderr,
            )

    out_path = os.path.join(ROOT, out_name)
    if sl is not None and os.path.exists(out_path):
        with open(out_path) as fh:
            prior = json.load(fh).get("queries", {})
        prior.update(report)
        report = prior
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "n_pass": sum(1 for r in report.values() if r["ok"]),
        "n_fail": sum(1 for r in report.values() if not r["ok"]),
        "sec": round(time.time() - t_start, 1),
        "failures": sorted(n for n, r in report.items() if not r["ok"]),
    }
    # name-filtered probe runs print their summary but do NOT clobber
    # the durable report
    if not only:
        with open(out_path, "w") as fh:
            json.dump({"summary": summary, "queries": report}, fh, indent=1)
    print(json.dumps(summary))
    # exit reflects the MERGED report, so the last chunked invocation
    # fails if any earlier slice recorded a failure
    return 1 if summary["n_fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
