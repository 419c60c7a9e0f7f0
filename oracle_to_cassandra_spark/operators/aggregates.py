"""Aggregation operators (SURVEY.md §2.4 + §7.2 step 3).

The reference exhibits only global count (A1, README.md:596,876),
DISTINCT projection (A2, README.md:988-1002), and static-column
first-per-key (A3, README.md:903-913). The full grouped-aggregation
surface below is the driver-checkable extension the north star
requires.

Scale notes:
  * Every groupBy gets a map-side partial aggregate for free
    (HashAggregate → Exchange → HashAggregate) — the shuffle carries
    one row per (partition × group), not per input row.
  * High-cardinality group keys: AQE coalesces or splits post-shuffle
    partitions; skewed keys only hurt sort-based fallback, which
    spills.
  * ``approx_count_distinct`` (HyperLogLog++) is the 100 TB path for
    distinct counts — constant memory per group vs a per-group hash
    set for the exact version.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_summary(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[F.Column]
) -> DataFrame:
    """groupBy().agg() with explicit aliased aggregate expressions."""
    return df.groupBy(*keys).agg(*aggs)


def rollup_summary(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[F.Column]
) -> DataFrame:
    """ROLLUP: hierarchical subtotals (k, k-1, …, grand total)."""
    return df.rollup(*keys).agg(*aggs)


def cube_summary(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[F.Column]
) -> DataFrame:
    """CUBE: subtotals for every key subset."""
    return df.cube(*keys).agg(*aggs)


def pivot_counts(
    df: DataFrame, key: str, pivot_col: str, values: Sequence[str]
) -> DataFrame:
    """Pivot long→wide with counts; empty cells coalesced to 0 so the
    result matches SQL conditional aggregation (FILTER (WHERE ...)).

    ``values`` must be pinned explicitly: at 100 TB an unpinned pivot
    first runs a distinct scan over the pivot column to discover them.
    """
    wide = df.groupBy(key).pivot(pivot_col, list(values)).count()
    out = wide.select(
        key, *[F.coalesce(F.col(v), F.lit(0)).alias(v) for v in values]
    )
    return out
