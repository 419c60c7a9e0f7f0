"""Scale-technique operators: bucketed co-located joins and salted
skew joins — the two manual levers SURVEY.md §4 reserves for 100 TB
(everything else is stock Catalyst/AQE).
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist a table bucketed (hash-partitioned + sorted) on its join
    key. Two tables bucketed the same way join with ZERO shuffle —
    the co-location contract Cassandra gets from token ranges, here
    from Spark bucketing. At 100 TB this converts the nightly
    fact⋈fact shuffle into a local merge per bucket. ``path`` makes
    the table external (location-stable across sessions)."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed saved tables: Catalyst recognizes the
    matching output partitioning and plans SortMergeJoin WITHOUT
    Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def salt_expr(
    columns: Sequence[str], salt_buckets: int, unique_col: str | None = None
):
    """The deterministic salt ``salted_join`` assigns each fact row:
    ``xxhash64(unique_col) mod n`` when a stable per-row id is given,
    else ``xxhash64(all columns) mod n``. Exposed so tests (and any
    caller that needs to predict routing) evaluate the OPERATOR's
    expression rather than a re-implementation."""
    src = [F.col(unique_col)] if unique_col is not None else [
        F.col(c) for c in columns
    ]
    return F.pmod(F.xxhash64(*src), F.lit(salt_buckets))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    unique_col: str | None = None,
) -> DataFrame:
    """Skew-join by salting: fact rows get a deterministic salt in
    [0, n); the (small) dim side is exploded ×n so every
    (key, salt) matches. A single hot key's rows then spread across n
    tasks instead of one straggler.

    AQE's skew-join split handles most cases automatically; explicit
    salting remains for when the skewed side must ALSO aggregate on
    the key (AQE can't split a skewed aggregation).

    The salt MUST be a deterministic function of the row, never of
    physical layout: a layout-dependent term (e.g.
    ``monotonically_increasing_id``) re-salts rows into different
    reduce partitions when a shuffle map task is recomputed after a
    fetch failure, which Spark's indeterminate-stage handling answers
    by aborting the job (or, on result-stage paths, by silently
    dropping/duplicating rows). So:

    * with ``unique_col`` (a stable per-row id such as ``l_orderkey``
      ⊕ ``l_linenumber`` pre-combined, or any surrogate key):
      ``salt = xxhash64(unique_col) mod n`` — deterministic AND
      spreads byte-identical payloads of the hot key across buckets.
    * without it: ``salt = xxhash64(all columns) mod n`` —
      deterministic, but byte-identical duplicate rows share a bucket.
      If the hot key's rows are mostly identical, supply
      ``unique_col``; attribute hashing cannot split them safely.

    The salt never reaches the output (dropped after the join)."""
    if unique_col is None:
        # r11 ADVICE item 3: the r11 determinism fix changed the
        # DEFAULT's behavior — byte-identical duplicate rows of a hot
        # key now hash to ONE salt bucket, so the no-unique_col form
        # no longer breaks up a duplicate-heavy straggler (the exact
        # case the old layout-dependent salt targeted, unsafely).
        # Surface that loss at the call site instead of silently
        # degrading: callers with duplicate-heavy facts must pass a
        # stable per-row id.
        warnings.warn(
            "salted_join without unique_col salts on all columns: "
            "byte-identical duplicate rows of a hot key share ONE "
            "bucket and will NOT be spread. Pass unique_col (a stable "
            "per-row id) if the fact side is duplicate-heavy.",
            UserWarning,
            stacklevel=2,
        )
    salted_fact = fact.withColumn(
        "_salt", salt_expr(fact.columns, salt_buckets, unique_col)
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = salted_fact.join(exploded_dim, on=[key, "_salt"])
    return joined.drop("_salt")
