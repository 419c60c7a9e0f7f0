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
3. divide ONCE at the end — one float op on the same exact integer is
   deterministic, and only then round for display.

Scale choice: 100 (cents) for 2-dp money columns keeps the sum within
int64 through ~9×10^16 cents; 10^6 (micro-units) for 6-dp scores.
The helpers below emit the SAME op sequence in the Spark expression
and the DuckDB oracle text so the driver hash compare stays exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_units(col: Column, scale: int = 100) -> Column:
    """Per-row integer-units value: ``round(col * scale)`` as long."""
    return F.round(col * scale).cast("long")


def exact_sum(col: Column, nd: int = 2, scale: int = 100) -> Column:
    """Order-proof ``round(sum(col), nd)`` via integer units."""
    return F.round(F.sum(int_units(col, scale)) / float(scale), nd)


def exact_avg(col: Column, nd: int = 6, scale: int = 100) -> Column:
    """Order-proof ``round(avg(col), nd)``: exact integer sum, one
    division by the scale, one by the non-null count (matches AVG's
    null semantics because ``sum``/``count`` skip the same rows)."""
    return F.round(
        (F.sum(int_units(col, scale)) / float(scale)) / F.count(col), nd
    )


def int_units_sql(expr: str, scale: int = 100) -> str:
    return f"CAST(round(({expr}) * {scale}) AS BIGINT)"


def exact_sum_sql(expr: str, nd: int = 2, scale: int = 100) -> str:
    """DuckDB twin of :func:`exact_sum` (``::BIGINT`` narrows DuckDB's
    HUGEINT sum so the division matches Spark's long / double)."""
    return (
        f"round(sum({int_units_sql(expr, scale)})::BIGINT"
        f" / {scale}.0, {nd})"
    )


def exact_avg_sql(expr: str, nd: int = 6, scale: int = 100) -> str:
    return (
        f"round((sum({int_units_sql(expr, scale)})::BIGINT"
        f" / {scale}.0) / count({expr}), {nd})"
    )
