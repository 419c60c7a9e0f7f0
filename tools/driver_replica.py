"""Driver-style verification: replicate the grading driver's
environment EXACTLY — a plain SparkSession (none of get_spark's confs)
— and run entry() plus the full queries()/oracle_sql() differential
against DuckDB at sf0.01.

This is the /verify recipe as a durable tool: the per-session pytest
replica and tools/sf_sweep.py both verify through
``oracle_to_cassandra_spark.session.get_spark``; this script is the
one path that proves every query ALSO holds under the driver's bare
session (no AQE tuning, shuffle=8, a different core count).

Usage:
    python tools/driver_replica.py [sf_dir] [name_substring ...]
    python tools/driver_replica.py --window [sf_dir]   # first 50 only

``--window`` restricts the run to the driver's verification window
(the first DRIVER_WINDOW entries of ``queries()``) — the fast
rotation check after editing registry._WINDOW (~50 s vs ~4 min).

Prints one JSON summary line; exit 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    args = sys.argv[1:]
    window_only = "--window" in args
    if window_only:
        args.remove("--window")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tests.compare import compare_query
    from tests.conftest import make_duckdb

    import __spark_entry__ as E

    n = E.entry(spark).count()
    print(f"entry(): {n} rows", file=sys.stderr)
    assert n > 0

    con = make_duckdb(sf_dir)
    qs = E.queries()
    oracles = E.oracle_sql()
    names = [
        m for m in qs if not only or any(s in m for s in only)
    ]
    if window_only:
        from oracle_to_cassandra_spark.registry import DRIVER_WINDOW

        # intersect with any positional substring filters instead of
        # silently discarding them (r10 ADVICE)
        window = list(qs)[:DRIVER_WINDOW]
        names = [m for m in window if m in set(names)]
        if not names:
            print(
                f"--window ∩ {only}: no window query matches "
                "(the name may sit in _QUEUE, not _WINDOW)",
                file=sys.stderr,
            )
            return 2

    failures = []
    t0 = time.time()
    for i, name in enumerate(names):
        try:
            if name in oracles:
                compare_query(qs[name](spark, sf_dir), con, oracles[name],
                              name=name)
            else:
                assert qs[name](spark, sf_dir).count() >= 0
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append(name)
            print(f"FAIL {name}: {str(exc)[:300]}", file=sys.stderr)
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(names)} ({len(failures)} fail, "
                  f"{round(time.time() - t0)}s)", file=sys.stderr)

    print(json.dumps({
        "metric": "driver_replica",
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "n_pass": len(names) - len(failures),
        "n_fail": len(failures),
        "sec": round(time.time() - t0, 1),
        "failures": failures,
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
