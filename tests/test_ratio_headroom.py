"""int64-headroom tripwire for the scaled ratio numerators.

``tpch_q14_promo_revenue`` and ``tpch_q8_market_share`` emit exact
fixed-point ratios by multiplying an exact integer-unit revenue sum by
1e6 / 1e4 before one integer division. Round 8's form multiplied the
1e-4-unit sum directly; at sf0.1 the q14 month sum is ~3.6e12 units,
so ×1e6 sat only 2.56× under int64 max — any sf ≥ ~0.26 (or a hotter
regenerated month) would overflow, which DuckDB raises on but
non-ANSI Spark silently wraps (round-8 ADVICE.md item 2). Round 9
drops both sums to cent scale (``div 100``) before the multiply,
buying 100× headroom.

This test re-measures that margin every session at the largest swept
SF: it evaluates the pre-multiply sums in DuckDB, applies the live
multiplier, and asserts the product stays ≥ ``_FACTOR``× under int64
max — so a regenerated/hotter fixture trips HERE before the driver
records a silent-wraparound hash mismatch. Guards on the oracle text
keep the probes from drifting from what the driver actually runs.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tests.conftest import make_duckdb  # noqa: E402

_INT64_MAX = 2**63 - 1

#: required multiple of remaining headroom at the largest swept SF.
#: 32× certifies the next regeneration / one SF decade of growth; the
#: cent-scale form measures ~250× (q14) and ~10^4× (q8) today.
_FACTOR = 32

_SF_DIRS = [
    d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_q14_promo_numerator_headroom(sf_dir):
    sql = E.oracle_sql()["tpch_q14_promo_revenue"]
    # guard: the live oracle still computes cents-sum × 1e6 — if the
    # form changes, update this probe alongside it
    assert "// 100) * 1000000" in sql, "q14 ratio form changed; update probe"
    con = make_duckdb(sf_dir)
    # the part join is FK-total (every l_partkey resolves), so the
    # month's denominator sum equals the join-free sum
    (sum_i,) = con.execute(
        """
        SELECT sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                   AS BIGINT))::BIGINT
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
        """
    ).fetchone()
    assert sum_i and sum_i > 0
    num = (sum_i // 100) * 1_000_000
    assert num * _FACTOR < _INT64_MAX, (
        f"q14 promo numerator {num:.3e} within {_FACTOR}x of int64 max at "
        f"{sf_dir} — Spark would silently wrap before DuckDB errors; "
        "coarsen the ratio scale"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_q8_mkt_share_numerator_headroom(sf_dir):
    sql = E.oracle_sql()["tpch_q8_market_share"]
    assert "// 100) * 10000" in sql, "q8 ratio form changed; update probe"
    # reuse the LIVE all_nations CTE so the probe's filter/join set
    # cannot drift from the oracle's
    cte, sep, _ = sql.partition("SELECT o_year")
    assert sep, "q8 oracle shape changed; update probe"
    con = make_duckdb(sf_dir)
    (max_total,) = con.execute(
        cte
        + """
        SELECT max(total_i) FROM (
          SELECT sum(CAST(round(volume * 10000) AS BIGINT))::BIGINT AS total_i
          FROM all_nations GROUP BY o_year
        )
        """
    ).fetchone()
    assert max_total and max_total > 0
    # the conditional (nation) numerator is bounded by the year total
    num = (max_total // 100) * 10_000
    assert num * _FACTOR < _INT64_MAX, (
        f"q8 mkt-share numerator bound {num:.3e} within {_FACTOR}x of int64 "
        f"max at {sf_dir} — coarsen the ratio scale"
    )
