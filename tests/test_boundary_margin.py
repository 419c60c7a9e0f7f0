"""Dynamic knife-edge tripwire for the audited second-moment floats.

``tests/test_exactness_guard.py`` STATICALLY sanctions four queries
whose compare columns round second-moment float aggregates
(corr/covar_samp/regr_*): closed-form integer conversion would
overflow int64, and the rounded values sit O(1e5)× further from a
rounding boundary (relative) than the engine drift that could flip
them. That audit is an argument about the CURRENT fixtures; this test
turns it into a measurement re-run every session.

For each audited site the oracle's ``round(<agg>, nd)`` wrapper is
mechanically stripped (paren-matched — derived from the LIVE oracle
text, so the probe cannot drift from what the driver runs) and the
unrounded aggregate is evaluated in DuckDB at sf0.001 and sf0.01.
Every non-null value must land at least ``_MARGIN`` scaled units
(value × 10^nd) away from the nearest x.5 rounding boundary — the
tie Spark (shortest-decimal HALF_UP) and DuckDB (binary-double round)
break differently. Cross-engine accumulation drift is ~1e-14
relative; with |v·10^nd| ≤ ~1e7 the drift is ≤ ~1e-7 scaled units,
so a 1e-5 margin certifies ~100× headroom while keeping the chance
of a spurious trip on a regenerated fixture below ~1e-2 across all
checked values. A trip here means: the new fixtures put a value on a
knife edge — convert that column (or widen its group) BEFORE the
driver records a flaky hash mismatch.
"""

from __future__ import annotations

import math
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tests.conftest import make_duckdb  # noqa: E402

#: the four queries test_exactness_guard.py's _AUDITED sanctions for
#: float second-moment compares
_QUERIES = (
    "correlation_price_quantity",
    "linear_regression_price_size",
    "quality_length_regression_per_source",
    "zipf_fit_per_corpus",
)

_AGG = r"(?:corr|covar_samp|covar_pop|regr_\w+)"

#: minimum |distance to nearest half| in value×10^nd units
_MARGIN = 1e-5


def _strip_rounds(sql: str) -> tuple[str, list[int]]:
    """Remove ``round(`` wrappers around audited agg sites; return the
    rewritten SQL and the list of stripped nd values."""
    nds: list[int] = []
    out = []
    i = 0
    pat = re.compile(rf"round\s*\(\s*(?={_AGG}\s*\()", re.I)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i : m.start()])
        # find the matching close paren of round(
        j = m.end()
        depth = 1
        while depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[m.end() : j - 1]
        # split inner at the top-level comma: body, nd
        depth = 0
        last = -1
        for k, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                last = k
        body, nd = inner[:last], inner[last + 1 :].strip()
        nds.append(int(nd))
        out.append(f"({body})")
        i = j
    return "".join(out), nds


def _half_distance(v: float, nd: int) -> float:
    scaled = abs(v) * 10**nd
    frac = scaled - math.floor(scaled)
    return abs(frac - 0.5)


@pytest.mark.parametrize("name", _QUERIES)
@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_second_moment_values_off_the_half_grid(name, sf_dir):
    sql = E.oracle_sql()[name]
    stripped, nds = _strip_rounds(sql)
    assert nds, f"{name}: no audited round(<second-moment>) site found"
    con = make_duckdb(sf_dir)
    cur = con.execute(stripped)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    assert rows
    offenders = []
    for row in rows:
        for col, v in zip(cols, row):
            if not isinstance(v, float) or v != v:  # non-float / NaN
                continue
            for nd in set(nds):
                d = _half_distance(v, nd)
                if d < _MARGIN:
                    offenders.append((col, v, nd, d))
    assert not offenders, (
        f"{name} @ {sf_dir}: unrounded second-moment value(s) within "
        f"{_MARGIN} scaled units of a rounding half-boundary — the tie "
        "Spark and DuckDB break differently. Convert the column to an "
        f"integer-exact form before the driver flips: {offenders}"
    )
