"""Dump .explain('formatted') for named queries to plans/r14/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> name [name ...]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    from oracle_to_cassandra_spark.plans.explain import formatted_plan
    from oracle_to_cassandra_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="dump-plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt if txt.endswith("\n") else txt + "\n")
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
