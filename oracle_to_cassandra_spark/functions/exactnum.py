"""Accumulation-order-proof float aggregates (the round-8 hardening).

``round(SUM(float), k)`` is a cross-engine flake: a parallel float
sum's value depends on partition merge order, so Spark and DuckDB can
disagree in the last ulp and the subsequent ``round`` FLIPS whenever
the true value sits near a rounding boundary (three real instances at
sf0.1 in round 7). The proof pattern used across this repo:

1. scale each ROW to integer units and round there —
   ``CAST(round(x * scale) AS BIGINT)`` is a deterministic per-row
   computation (identical IEEE ops on identical inputs in both
   engines);
2. SUM the integers — int64 addition is associative, so any
   accumulation order yields the same value;
3. emit INTEGER units — either the raw sum, ``sum / 10**nd`` when
   ``scale == 10**nd`` (the division lands exactly ON the nd-dp
   grid, so the final round is an identity), or an integer ``div``.

What is NOT allowed (verified live in round 8): a final
``round(sum_units / D, nd)`` with ``D > 10**nd``, or a mean
``round((sum_units/scale)/count, nd)``. The true value can then sit
exactly on an nd-dp HALF, and the engines round such ties
DIFFERENTLY — Spark quantizes the double's shortest-decimal repr
(BigDecimal HALF_UP) while DuckDB rounds the binary double:
``round(86958149950/10000.0, 2)`` → Spark 8695815.00, DuckDB
8695814.99. ``tests/test_exactness_guard.py`` statically rejects the
whole class; integer ``div`` (identical truncation toward zero in
both engines, negatives included — verified ``-7 div 2 == -7 // 2 ==
-3``) or ``floor(x*10**nd + 0.5)`` on an identical double (floor has
no repr-vs-binary ambiguity) are the sanctioned emissions.

Scale choice: 100 (cents) for 2-dp money columns keeps the sum within
int64 through ~9×10^16 cents; 10^6 (micro-units) for 6-dp scores.
The helpers below emit the SAME op sequence in the Spark expression
and the DuckDB oracle text so the driver hash compare stays exact.

Python-side integer-fold audit (r11 verdict item 4 — the float64/2^53
hazard: any pandas/numpy path where an int64 quantity transits a
float64 dtype rounds silently past 2^53). Every Python-side integer
fold in the package, and why each is exact:

* ``streaming/stateful.py:_int_sum`` — the r11 fix itself:
  ``col.dropna().astype("int64").sum()`` sums in int64; a NULL-laden
  micro column arrives float64 but is re-typed BEFORE the fold.
  Regression test: ``tests/test_session_expiry.py::
  test_int_sum_is_exact_with_nulls``.
* ``queries/udfs.py:cogrouped_order_reconciliation`` — per-order
  cents sum in int64 pandas groupby (no NULLs: cents is freshly
  computed), then cast to nullable ``Int64`` BEFORE the left-merge so
  unmatched orders surface as ``pd.NA`` instead of upcasting the
  column to float64 (fixed in r12; test
  ``tests/test_udf_queries.py::test_reconcile_merge_exact_past_2_53``).
* ``operators/multimodal.py`` (BMP pixel sums :498, resize block
  sums :634, Y4M plane sums :778, aHash luma :845, WAV amplitude
  :359) — all ``np.frombuffer`` dense buffers ``astype(np.int64)``
  before summing: int64 arithmetic end-to-end, no NULLs possible
  (buffers), values additionally bounded (uint8/int16 × ≤ blob
  bytes ≪ 2^53).
* ``queries/udfs.py:_l1_micro`` (arrow UDF) — ``np.floor(|x|·10^6 +
  0.5).astype(np.int64)`` then ``np.add.reduceat`` on int64: exact.
* Float-semantics-by-design paths (NOT integer folds, exempt):
  ``functions/vector.py`` cosine (double output), ``operators/
  udfs.py:zscore_per_group`` (double z-score), all streaming
  mean/stddev emissions (oracled in integer micro-units upstream).

New Python-side folds MUST either stay int64/Int64 end-to-end or
re-type with ``dropna().astype("int64")`` before summing; add the
fold to this list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_units(col: Column, scale: int = 100) -> Column:
    """Per-row integer-units value: ``round(col * scale)`` as long."""
    return F.round(col * scale).cast("long")


def exact_sum(col: Column, nd: int = 2, scale: int = 100) -> Column:
    """Order-proof ``round(sum(col), nd)`` via integer units.

    SAFE only when ``scale == 10**nd`` — the final division then
    lands exactly ON the nd-dp grid and the round is an identity in
    both engines (asserted)."""
    assert scale == 10**nd, "scale > 10^nd reintroduces round ties"
    return F.round(F.sum(int_units(col, scale)) / float(scale), nd)


def exact_avg_units(expr: str, scale: int = 100) -> Column:
    """Order-proof INTEGER-units mean: exact int64 sum of per-row
    units, ONE integer ``div`` by the non-null count (matches AVG's
    null semantics because ``sum``/``count`` skip the same rows).
    Emits BIGINT in 1/scale units — no float round exists to tie.

    Takes a SQL expression string (not a Column) so the identical
    text can parameterize both engines."""
    return F.expr(
        f"sum(CAST(round(({expr}) * {scale}) AS BIGINT)) div count({expr})"
    )


def int_units_sql(expr: str, scale: int = 100) -> str:
    return f"CAST(round(({expr}) * {scale}) AS BIGINT)"


def exact_sum_sql(expr: str, nd: int = 2, scale: int = 100) -> str:
    """DuckDB twin of :func:`exact_sum` (``::BIGINT`` narrows DuckDB's
    HUGEINT sum so the division matches Spark's long / double)."""
    assert scale == 10**nd, "scale > 10^nd reintroduces round ties"
    return (
        f"round(sum({int_units_sql(expr, scale)})::BIGINT"
        f" / {scale}.0, {nd})"
    )


def exact_avg_units_sql(expr: str, scale: int = 100) -> str:
    """DuckDB twin of :func:`exact_avg_units`."""
    return (
        f"(sum({int_units_sql(expr, scale)})::BIGINT // count({expr}))"
    )
