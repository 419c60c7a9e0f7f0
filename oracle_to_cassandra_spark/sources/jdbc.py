"""JDBC source — the reference's load path, re-expressed for PySpark.

Covers S1–S3 of SURVEY.md §2.1:
  * plain table scan (`/root/reference/README.md:462,466`)
  * partitioned parallel scan with ``partitionColumn`` /
    ``lowerBound`` / ``upperBound`` / ``numPartitions``
    (`README.md:549-558`) — the bounds set the *stride*, not a filter:
    all rows are always returned (`README.md:542`)
  * ``fetchsize`` batching (1000 vs the Oracle driver's default 10,
    `README.md:543,557`)

No database runs in the test container, so this module is exercised by
unit tests against a mocked reader and by the option-dict builder; the
code path itself is the production path.

Scale notes: one JDBC connection per partition per executor — the
stride partitioning is what makes a 100 TB initial load parallel, and
``numPartitions`` must be capped so the source database isn't DDoSed
(the reference warns exactly this at README.md:561).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCHSIZE = 1000  # README.md:543 — Oracle driver default is 10


def jdbc_options(
    url: str,
    dbtable: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    **extra: str,
) -> dict[str, str]:
    """Build the option map for ``spark.read.format("jdbc")``.

    Mirrors README.md:549-558: a partitioned scan needs all four of
    partitionColumn/lowerBound/upperBound/numPartitions (and the
    column must be numeric, README.md:541).
    """
    opts: dict[str, str] = {"url": url, "dbtable": dbtable, "fetchsize": str(fetchsize)}
    if driver:
        opts["driver"] = driver
    partition_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in partition_opts):
        if any(o is None for o in partition_opts):
            raise ValueError(
                "partitioned JDBC scan needs all of partitionColumn, "
                "lowerBound, upperBound, numPartitions (README.md:549-558)"
            )
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc_table(spark: SparkSession, **options) -> DataFrame:
    """S1–S3: ``spark.read.format("jdbc")`` with the validated option
    map. Lazy — schema comes from database metadata immediately, rows
    only at the first action (README.md:471,577)."""
    return spark.read.format("jdbc").options(**jdbc_options(**options)).load()
