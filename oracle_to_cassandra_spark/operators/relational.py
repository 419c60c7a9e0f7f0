"""Reference-native relational operators (SURVEY.md §2.2–§2.3).

Each function is a thin, named composition over the DataFrame API so
Catalyst sees a plain declarative plan (projection pruning, predicate
pushdown, and join-strategy selection all stay automatic).

Reference citations are to `/root/reference/README.md`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P2/P3 (README.md:781,804): column projection. Catalyst prunes
    the scan's ReadSchema to exactly these columns."""
    return df.select(*cols)


def rename_all(df: DataFrame, new_names: Sequence[str]) -> DataFrame:
    """P4 (README.md:733-739): positional bulk rename via ``toDF`` —
    the reference lower-cases all 11 employee columns this way for
    Cassandra case-matching (README.md:705-709)."""
    if len(new_names) != len(df.columns):
        raise ValueError(
            f"rename_all: got {len(new_names)} names for {len(df.columns)} columns"
        )
    return df.toDF(*new_names)


def rename_lowercase(df: DataFrame) -> DataFrame:
    """P4 specialization: lower-case every column (the sink-side
    requirement at README.md:708)."""
    return rename_all(df, [c.lower() for c in df.columns])


def eq_filter(df: DataFrame, column: str, value) -> DataFrame:
    """P5/P6 (README.md:321,338,347,363,371,379,389): single-column
    equality predicate — numeric or string. Pushed into the scan."""
    return df.filter(F.col(column) == F.lit(value))


def point_lookup(df: DataFrame, key_column: str, key) -> DataFrame:
    """P7 (README.md:696-703): partition-key point lookup. On a
    partition-pruned sink layout this touches one partition; on a raw
    scan it is a pushed-down equality filter."""
    return eq_filter(df, key_column, key)


def inner_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | str | Sequence[str],
    broadcast_right: bool = False,
) -> DataFrame:
    """J1 (README.md:931): inner equi-join — the only join shape the
    reference exhibits (comma-syntax SQL with a WHERE equality).

    Scale: pass ``broadcast_right=True`` for dimension sides — the
    27-row departments table of the reference, or region/nation here —
    so the fact side never shuffles. Catalyst would usually pick this
    on its own under the autoBroadcastJoinThreshold; the hint makes the
    plan deterministic regardless of stats.
    """
    right = F.broadcast(right) if broadcast_right else right
    return left.join(right, on=on, how="inner")


def self_join(
    df: DataFrame,
    left_alias: str,
    right_alias: str,
    condition: Column,
) -> DataFrame:
    """J2 (README.md:318-359,1029-1032): self equi-join — the
    employee→manager lookup the reference does as two point queries and
    asks to materialize in its Query 4 exercise.

    Scale: a self-join shuffles both aliases on the join key; AQE
    handles skewed keys (a "manager" with millions of reports) by
    splitting the skewed partitions.
    """
    return df.alias(left_alias).join(df.alias(right_alias), on=condition, how="inner")


def fk_chain_join(
    fact: DataFrame,
    hops: Sequence[tuple[DataFrame, Column, bool]],
) -> DataFrame:
    """J3 (README.md:317-394): the 6-hop FK walk generalized — chain
    inner equi-joins from a fact table through its dimensions.

    ``hops`` is ``(dim_df, join_condition, broadcast)`` per hop.
    Scale: every dimension hop that is broadcast keeps the plan a
    single fact-scan pipeline with no shuffle; only fact↔fact hops
    exchange data.
    """
    out = fact
    for dim, cond, broadcast in hops:
        out = inner_equi_join(out, dim, cond, broadcast_right=broadcast)
    return out


def distinct_projection(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A2 (README.md:988-1002): ``SELECT DISTINCT`` over a projection —
    the CQL "distinct partition key + static column" read.

    Scale: distinct is a shuffle on all projected columns; project
    *first* so the exchange carries only the needed bytes. AQE
    coalesces the post-shuffle partitions.
    """
    return df.select(*cols).distinct()


def limit_sample(df: DataFrame, n: int) -> DataFrame:
    """L1 (README.md:498,582,...): first-n rows (``show(5)`` analog).
    Spark short-circuits the scan — no full materialization."""
    return df.limit(n)
