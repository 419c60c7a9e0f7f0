"""Structured Streaming core: stream source wiring + synchronous
micro-batch execution for tests/driver checks.

The reference is batch-only ETL (SURVEY.md §2.6: streaming explicitly
absent); this is north-star surface. The ``events`` table is the
stream-shaped input (event_id, ts, user_id, event_type, value, props).

Scale notes: the same logical plans here run against Kafka/files on a
cluster; event-time windows + watermarks bound state, and
``availableNow`` triggers give batch-backfill semantics with streaming
code. The memory sink is only for local verification.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the events schema as the stream source sees it — ts arrives as
#: nanosecond longs (parquet TIMESTAMP(NANOS) read under the
#: nanosAsLong conf) and is normalized to TimestampType here.
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet — the file-source analog
    of a Kafka topic; schema must be declared (no streaming
    inference)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source lists a DIRECTORY (a Kafka-topic analog);
    # pathGlobFilter narrows it to the events table
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def run_stream_to_memory(
    result: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan to completion against the memory sink
    (synchronous: availableNow trigger + processAllAvailable) and
    return the materialized result as a batch DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return result.sparkSession.table(name)
