"""Empirical scaling report: time EVERY registered query at several
scale factors and flag super-linear growth.

PLANS.md answers "is this the plan I want" statically (exchanges,
pushed filters, codegen spans); the differential sweeps answer "is it
correct at sf0.1".  This tool answers the remaining 100-TB question
EMPIRICALLY: when the data grows 10x, does the runtime grow at most
~10x?  A query whose time ratio across sf0.01 -> sf0.1 is well above
the 10x data ratio is hiding a super-linear stage (an un-pruned
candidate cross-product, a global sort that stopped spilling linearly,
a skew collapse) that a 1000x scale-up would turn into the bottleneck
— no amount of local[32] green hides that.

Method
------
* Each query is forced to full execution with a noop write (same as
  bench.py) and timed ``--passes`` times per SF; the per-(query, SF)
  MIN is kept (sub-second JVM jitter reads as fake super-linearity
  otherwise).
* One SparkSession per SF (matches bench.py's measurement posture;
  page-cache warmth is equalized by the min-of-N).
* Verdict per query, from t01 = t(sf0.01), t10 = t(sf0.1):
    - ``overhead-bound``: t10 < 1.0 s — fixed per-query overhead
      (session, codegen, micro-batch setup) dominates; the ratio is
      not informative at these sizes.
    - ``sub-linear``  : r = t10/t01 <= 3 — scan/overhead dominated.
    - ``~linear``     : 3 < r <= 12 — tracks the 10x data growth
      (12, not 10, leaves headroom for fixed overhead shifting
      between numerator and denominator).
    - ``SUPER-LINEAR``: r > 12 — grows faster than the data; listed
      first and exit code 1 under ``--strict``.

Usage:
    python tools/scaling_report.py [--passes N] [--sfs d1,d2,...]
                                   [name_substring ...]

Writes SCALING.md (human table, flagged queries first) and
SCALING_LOCAL.json (full numbers) at the repo root, prints a one-line
JSON summary to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _sf_of(d: str) -> float:
    return float(d.rstrip("/").rsplit("sf", 1)[-1])


def _time_surface(sf_dir: str, names, passes: int) -> dict[str, float]:
    """Min-of-N wall time per query at one SF, one SparkSession."""
    from oracle_to_cassandra_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name=f"scaling-{os.path.basename(sf_dir)}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
    out: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            t0 = time.perf_counter()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                t = time.perf_counter() - t0
                prev = out.get(name)
                out[name] = t if prev is None or prev < 0 else min(prev, t)
            except Exception as exc:
                print(f"scaling: {name} @ {sf_dir} FAILED: {exc}",
                      file=sys.stderr)
                out.setdefault(name, -1.0)
    spark.stop()
    return out


def _verdict(t01: float, t10: float) -> str:
    if t01 <= 0 or t10 <= 0:
        return "errored"
    if t10 < 1.0:
        return "overhead-bound"
    r = t10 / t01
    if r > 12:
        return "SUPER-LINEAR"
    if r > 3:
        return "~linear"
    return "sub-linear"


def main() -> int:
    argv = sys.argv[1:]
    passes, strict = 2, False
    sf_dirs = list(DEFAULT_SFS)
    subs: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--passes":
            passes = int(argv[i + 1]); i += 2
        elif a == "--sfs":
            sf_dirs = argv[i + 1].split(","); i += 2
        elif a == "--strict":
            strict = True; i += 1
        else:
            subs.append(a); i += 1

    import __spark_entry__ as E

    names = sorted(E.queries())
    if subs:
        names = [n for n in names if any(s in n for s in subs)]

    grid: dict[str, dict[str, float]] = {}
    for d in sf_dirs:
        tag = f"sf{_sf_of(d):g}"
        t0 = time.perf_counter()
        grid[tag] = _time_surface(d, names, passes)
        print(f"scaling: {tag} done in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    tags = sorted(grid, key=lambda t: float(t[2:]))
    lo, hi = tags[-2], tags[-1]  # the two largest SFs drive the verdict
    data_ratio = float(hi[2:]) / float(lo[2:])

    rows = []
    for n in names:
        t_lo, t_hi = grid[lo].get(n, -1.0), grid[hi].get(n, -1.0)
        r = (t_hi / t_lo) if t_lo > 0 and t_hi > 0 else float("nan")
        rows.append({
            "query": n,
            **{t: round(grid[t].get(n, -1.0), 3) for t in tags},
            "ratio": round(r, 2) if r == r else None,
            "verdict": _verdict(t_lo, t_hi),
        })

    order = {"SUPER-LINEAR": 0, "errored": 1, "~linear": 2,
             "sub-linear": 3, "overhead-bound": 4}
    rows.sort(key=lambda x: (order[x["verdict"]], -(x["ratio"] or 0)))

    flagged = [x for x in rows if x["verdict"] == "SUPER-LINEAR"]
    errored = [x for x in rows if x["verdict"] == "errored"]

    payload = {
        "metric": "scaling_report",
        "sf_dirs": sf_dirs,
        "passes": passes,
        "data_ratio": data_ratio,
        "n_queries": len(rows),
        "n_super_linear": len(flagged),
        "n_errored": len(errored),
        "super_linear": [x["query"] for x in flagged],
        "rows": rows,
    }
    with open(os.path.join(ROOT, "SCALING_LOCAL.json"), "w") as fh:
        json.dump(payload, fh, indent=1)

    hdr = " | ".join(["query"] + tags + [f"t({hi})/t({lo})", "verdict"])
    sep = " | ".join(["---"] * (len(tags) + 3))
    lines = [
        "# SCALING — empirical scale-up report",
        "",
        f"Every registered query timed (min of {passes} passes, noop "
        f"sink) at {', '.join(tags)}; the {lo}→{hi} time ratio is "
        f"judged against the {data_ratio:g}× data ratio. "
        "`SUPER-LINEAR` (ratio > 12) means the query grows faster than "
        "its input and would NOT survive a 100× scale-up unchanged; "
        "`overhead-bound` means fixed per-query cost still dominates "
        f"at {hi} and the ratio carries no signal. Generated by "
        "`tools/scaling_report.py` — regenerate after changing any "
        "query's plan shape.",
        "",
        f"**{len(flagged)} SUPER-LINEAR / {len(errored)} errored / "
        f"{len(rows)} total.**",
        "",
        f"| {hdr} |",
        f"| {sep} |",
    ]
    for x in rows:
        cells = [x["query"]] + [f"{x[t]:.2f}" for t in tags] + [
            ("" if x["ratio"] is None else f"{x['ratio']:.2f}"),
            x["verdict"],
        ]
        lines.append("| " + " | ".join(cells) + " |")
    with open(os.path.join(ROOT, "SCALING.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    summary = {k: payload[k] for k in (
        "metric", "data_ratio", "n_queries", "n_super_linear",
        "n_errored", "super_linear")}
    print(json.dumps(summary, separators=(",", ":")))
    return 1 if strict and (flagged or errored) else 0


if __name__ == "__main__":
    sys.exit(main())
