"""Window-function operators (SURVEY.md §2.5 L2 generalized, §7.2
step 4).

The reference's only ordering construct is the clustering-column scan
(`/root/reference/README.md:909,1005-1022`) — rows of one partition
returned in clustering order. Window functions generalize it: ranking,
analytic (lag/lead), and aggregate-over-frame.

Scale notes:
  * A window = one shuffle on ``partitionBy`` keys + a spillable
    within-partition sort. Windows over the SAME partitioning reuse
    the exchange — batch window columns together.
  * An un-partitioned window (global ORDER BY) serializes onto a
    single task: never do that at 100 TB; top-k uses the
    TakeOrderedAndProject path (orderBy().limit()) instead.
  * Ranking with ties must carry a unique tie-break column for
    deterministic output (driver hash compare).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def partitioned_window(
    partition_by: Sequence[str], order_by: Sequence[Column | str]
) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number ≤ k — the generalized
    clustering-order read (L2). Spark pushes a per-partition limit
    below the final sort (WindowGroupLimit) so each group only keeps
    k candidates per input partition."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
