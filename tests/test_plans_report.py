"""Invariant lock on PLANS.md — the committed physical-plan audit.

`tools/plan_report.py` regenerates PLANS.md each round (it executes
streaming queries, so it is a tool, not a test). This test pins the
properties the report exists to prove, and forces a regeneration
whenever the registered surface changes (name-set equality), so the
committed artifact cannot silently go stale against the registry:

- every registered query has a row; no ERROR rows;
- zero CartesianProduct anywhere;
- Python appears only as Arrow-tier stages (ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas / PythonDataSource / the
  streaming state variants) — row-at-a-time BatchEvalPython never;
- per-query shuffle-exchange counts stay within the audited budget
  (default 9; the named exceptions are individually justified);
- the oracle/rows-only marking matches the live registry.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

_PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
)

#: queries audited above the default 9-exchange budget
#: (note: staged/checkpointed pipelines truncate lineage, so a
#: query's row counts only its post-staging consumer exchanges —
#: the staged pipelines' own exchanges run once in materialization
#: jobs, which is exactly the reuse staging buys)
_EXCHANGE_CAP = {
    # df-capped inverted-index ground truth + LSH pipeline + verify
    "lsh_dedup_recall_vs_exact": 10,
}
_DEFAULT_CAP = 9

_ROW = re.compile(
    r"^\|\s*(\w+)\s*\|\s*(\d+|ERROR)\s*\|([^|]*)\|([^|]*)\|([^|]*)\|"
    r"\s*(oracle|rows-only)?\s*\|?\s*$"
)


def _rows():
    out = {}
    with open(_PLANS) as fh:
        for line in fh:
            m = _ROW.match(line.strip())
            if m and m.group(1) != "query":
                out[m.group(1)] = {
                    "exchanges": m.group(2),
                    "joins": m.group(3).strip(),
                    "python": m.group(5).strip(),
                    "check": (m.group(6) or "").strip(),
                }
    return out


def test_plans_report_covers_live_surface():
    rows = _rows()
    live = set(E.queries())
    assert set(rows) == live, (
        "PLANS.md is stale vs the registry — rerun "
        f"`python tools/plan_report.py` (missing={sorted(live - set(rows))[:5]}, "
        f"extra={sorted(set(rows) - live)[:5]})"
    )


def test_plans_report_no_errors_no_cartesian_no_row_python():
    rows = _rows()
    errors = [n for n, r in rows.items() if r["exchanges"] == "ERROR"]
    assert not errors, f"PLANS.md ERROR rows: {errors}"
    cartesian = [n for n, r in rows.items() if "Cartesian" in r["joins"]]
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    row_py = [n for n, r in rows.items() if "BatchEvalPython" in r["python"]]
    assert not row_py, f"row-at-a-time Python in: {row_py}"


def test_plans_report_exchange_budget():
    rows = _rows()
    over = {
        n: int(r["exchanges"])
        for n, r in rows.items()
        if r["exchanges"] != "ERROR"
        and int(r["exchanges"]) > _EXCHANGE_CAP.get(n, _DEFAULT_CAP)
    }
    assert not over, (
        f"exchange count above audited budget: {over} — either fix the "
        "plan or audit the budget in _EXCHANGE_CAP"
    )


def test_plans_report_check_column_matches_registry():
    rows = _rows()
    oracled = set(E.oracle_sql())
    wrong = {
        n: r["check"]
        for n, r in rows.items()
        if r["check"] != ("oracle" if n in oracled else "rows-only")
    }
    assert not wrong, f"oracle/rows-only marking drifted: {wrong}"
