"""Structured Streaming queries (rows-only driver checks — these are
the genuinely non-SQL-expressible ops per the driver contract; their
batch-equivalent twins in queries/event_time.py carry the DuckDB
oracles).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query("stream_tumbling_event_counts")  # streaming: rows-only check
def stream_tumbling_event_counts(spark, sf_dir):
    """readStream → tumbling 1-day window counts → memory sink
    (complete mode). Identical logical agg to
    ``tumbling_daily_event_counts`` — the DuckDB-checked batch twin."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_stream_to_memory(agg, output_mode="complete")


@query("stream_sessionization_watermark")  # streaming: rows-only check
def stream_sessionization_watermark(spark, sf_dir):
    """readStream → watermark(10 min) → session_window(30 min) per user
    → memory sink. The streaming twin of ``session_windows_per_user``;
    the watermark bounds session state — sessions idle past the
    watermark are finalized and evicted. Session-window aggregation
    supports append/complete output (not update); complete returns
    every finalized + in-flight session for the rows-only check."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), _TS_FMT).alias("session_start"),
            "n_events",
        )
    )
    return run_stream_to_memory(agg, output_mode="complete")


@query("stream_static_enrichment_join")  # streaming: rows-only check
def stream_static_enrichment_join(spark, sf_dir):
    """Stream-static join: the event stream enriched against the
    static customer dimension (broadcast per micro-batch) — the
    standard streaming-ETL enrichment shape; aggregated per segment so
    the memory-sink result is small."""
    from oracle_to_cassandra_spark.sources import load_table

    ev = read_events_stream(spark, sf_dir)
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(customers), "user_id")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return run_stream_to_memory(agg, output_mode="complete")


@query("stream_dedup_within_watermark")  # streaming: rows-only check
def stream_dedup_within_watermark(spark, sf_dir):
    """Streaming deduplication: dropDuplicatesWithinWatermark on
    (user_id, event_type) — state for a key is held only until the
    watermark passes, so the dedup store is bounded (the streaming
    twin of exact dedup: at 100 TB/day the unbounded variant would
    accumulate forever)."""
    ev = read_events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id")
    )
    return run_stream_to_memory(deduped, output_mode="append")


@query("stream_stateful_user_profile")  # streaming: rows-only check
def stream_stateful_user_profile(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running profile with explicit state schema — the north-star custom
    stateful streaming surface."""
    from oracle_to_cassandra_spark.streaming.stateful import user_profile_stream

    ev = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(user_profile_stream(ev), output_mode="update")
