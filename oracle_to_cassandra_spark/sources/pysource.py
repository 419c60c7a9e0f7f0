"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API)
— the engine's 'new source format' surface.

``SyntheticEventsDataSource`` is a partition-parallel generator source:
deterministic rows derived from (partition, offset) — the template for
wrapping any record-oriented system (a REST API, a message queue, a
proprietary format) as a first-class ``spark.read`` source with real
partitioning.

Scale notes: ``partitions()`` drives parallelism — each partition
reads independently on an executor (same contract as the JDBC stride
scan S3, README.md:549-558). Schema is declared, so Catalyst can prune
and push as usual above the source.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

N_PARTITIONS = 8
ROWS_PER_PARTITION = 1000


class _RangePartition(InputPartition):
    def __init__(self, pid: int):
        self.pid = pid


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_partitions = int(options.get("numPartitions", N_PARTITIONS))
        self.rows_per_partition = int(
            options.get("rowsPerPartition", ROWS_PER_PARTITION)
        )

    def partitions(self):
        return [_RangePartition(i) for i in range(self.n_partitions)]

    def read(self, partition: _RangePartition):
        base = partition.pid * self.rows_per_partition
        for i in range(self.rows_per_partition):
            rid = base + i
            # deterministic synthetic attributes (mirrorable in SQL)
            yield (rid, rid % 97, (rid * rid) % 1000)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events") after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return StructType(
            [
                StructField("rid", LongType(), False),
                StructField("bucket", LongType(), False),
                StructField("score", LongType(), False),
            ]
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
