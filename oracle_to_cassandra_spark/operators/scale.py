"""Scale-technique operators: bucketed co-located joins and salted
skew joins — the two manual levers SURVEY.md §4 reserves for 100 TB
(everything else is stock Catalyst/AQE).
"""

from __future__ import annotations

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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-join by salting: fact rows get a deterministic salt in
    [0, n); the (small) dim side is exploded ×n so every
    (key, salt) matches. A single hot key's rows then spread across n
    tasks instead of one straggler.

    AQE's skew-join split handles most cases automatically; explicit
    salting remains for when the skewed side must ALSO aggregate on
    the key (AQE can't split a skewed aggregation). The salt mixes
    the row's attributes with ``monotonically_increasing_id`` so even
    BYTE-IDENTICAL duplicate rows of the hot key spread across
    buckets — an attribute-only hash would send them all to one task,
    the exact straggler this operator exists to break up. The salt
    never reaches the output (dropped after the join), so result
    determinism is unaffected by the id's partition-layout
    dependence."""
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*fact.columns, F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        ),
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = salted_fact.join(exploded_dim, on=[key, "_salt"])
    return joined.drop("_salt")
