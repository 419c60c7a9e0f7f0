"""Event-time windowing over the stream-shaped ``events`` table,
batch-checkable (SURVEY.md §7.2 step 7: batch-equivalent event-time
windows first, DuckDB-checked; the readStream variants live in
``queries/streaming.py`` with rows-only checks).

Window starts are epoch-aligned in both engines (F.window ↔
time_bucket / date_trunc — verified identical alignment). Timestamps
are emitted as formatted strings (SURVEY.md §7.4 hard part #2).

Scale notes: a tumbling/sliding window agg is an ordinary groupBy on
(window, keys) — map-side partial aggregation applies; session windows
shuffle per user and merge sorted runs, the same mechanics Structured
Streaming uses with state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "tumbling_daily_event_counts",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*)::BIGINT      AS n_events,
           (sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT // 10000)
             AS total_value_c
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_daily_event_counts(spark, sf_dir):
    """Tumbling 1-day event-time windows per event type. The value
    total is emitted in integer CENTS (exact micro-unit sum, one int64
    `div`) — a final ``round(sum_u/1e6, 2)`` float round diverges
    between engines when the sum lands on a half-cent (Spark rounds
    the shortest-decimal repr, DuckDB the binary double)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "sum(CAST(round(value * 1000000) AS BIGINT)) div 10000"
            ).alias("total_value_c"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value_c",
        )
    )


@query(
    "tumbling_6h_windows",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '{_TS_FMT_DUCK}') AS window_start,
           count(*)::BIGINT     AS n_events,
           (sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT
            // count(value)) AS avg_value_micro
    FROM events
    GROUP BY 1
    """,
)
def tumbling_6h_windows(spark, sf_dir):
    """Sub-daily tumbling windows — F.window's epoch alignment matches
    DuckDB's time_bucket (probed: both put 07:30 into the 06:00
    bucket). The mean is the exact integer micro-unit mean (int64 sum,
    one `div` by the count) — a float ``round(mean, 6)`` ties at the
    half-micro whenever the count divides 2·sum oddly, and the engines
    round such ties differently."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "sum(CAST(round(value * 1000000) AS BIGINT)) div count(value)"
            ).alias("avg_value_micro"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "avg_value_micro",
        )
    )


@query(
    "sliding_2d_1d_windows",
    oracle=f"""
    WITH assigned AS (
      SELECT strftime(date_trunc('day', ts), '{_TS_FMT_DUCK}') AS window_start, value
      FROM events
      UNION ALL
      SELECT strftime(date_trunc('day', ts) - INTERVAL '1 day', '{_TS_FMT_DUCK}'), value
      FROM events
    )
    SELECT window_start, count(*)::BIGINT AS n_events,
           (sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT // 10000)
             AS total_value_c
    FROM assigned GROUP BY 1
    """,
)
def sliding_2d_1d_windows(spark, sf_dir):
    """Sliding windows (2-day length, 1-day slide): every event lands
    in exactly two windows — Spark's window() explodes the assignment;
    the oracle materializes the same two-way assignment with UNION ALL.
    Totals in integer cents (see tumbling_daily_event_counts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "sum(CAST(round(value * 1000000) AS BIGINT)) div 10000"
            ).alias("total_value_c"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "total_value_c",
        )
    )


@query(
    "session_windows_per_user",
    oracle=f"""
    WITH flagged AS (
      -- BOTH windows order by (ts, event_id): under duplicate
      -- timestamps a bare ORDER BY ts lets the lag window and the
      -- running-sum window place the flag row at DIFFERENT positions
      -- among the tied rows, splitting one session arbitrarily —
      -- Spark's interval-merging session_window is tie-insensitive,
      -- so the rewrite must be too (temporal stress sweep)
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '{_TS_FMT_DUCK}')                         AS session_start,
           strftime(max(ts) + INTERVAL '30 minutes', '{_TS_FMT_DUCK}') AS session_end,
           count(*)::BIGINT     AS n_events,
           (sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT // 10000)
             AS session_value_c
    FROM numbered GROUP BY user_id, session_id
    """,
)
def session_windows_per_user(spark, sf_dir):
    """Session windows (30-min inactivity gap) per user —
    ``session_window`` in batch mode. Semantics (probed): an event at
    exactly prev_ts+gap MERGES; a new session starts only when the gap
    is strictly exceeded; session end = last event + gap. The oracle is
    the classic gaps-and-islands rewrite.

    Scale: sessionization shuffles once on user_id; Structured
    Streaming runs the identical operator incrementally with state +
    watermark (see queries/streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "sum(CAST(round(value * 1000000) AS BIGINT)) div 10000"
            ).alias("session_value_c"),
        )
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), _TS_FMT_SPARK).alias("session_start"),
            F.date_format(F.col("sw.end"), _TS_FMT_SPARK).alias("session_end"),
            "n_events",
            "session_value_c",
        )
    )


@query(
    "late_data_watermark_semantics",
    oracle=f"""
    WITH max_ts AS (SELECT max(ts) AS m FROM events)
    SELECT strftime(date_trunc('day', e.ts), '{_TS_FMT_DUCK}') AS window_start,
           count(*)::BIGINT AS n_events
    FROM events e, max_ts
    WHERE e.ts > max_ts.m - INTERVAL '7 days'
    GROUP BY 1
    """,
)
def late_data_watermark_semantics(spark, sf_dir):
    """Batch illustration of watermark-style late-data cutoff: events
    older than (max event time − 7 days) are dropped before the
    windowed aggregation — the same admission rule a streaming
    watermark enforces incrementally."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff"))
    kept = ev.join(F.broadcast(cutoff)).filter(F.col("ts") > F.col("cutoff"))
    return (
        kept.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "n_events",
        )
    )


@query(
    "props_key_profile",
    oracle="""
    SELECT array_to_string(list_sort(json_keys(props)), ',') AS key_signature,
           count(*)::BIGINT AS n_events
    FROM events GROUP BY 1
    """,
)
def props_key_profile(spark, sf_dir):
    """Semi-structured SCHEMA-DRIFT profile: every event's JSON props
    reduced to its SORTED key set, counted per distinct signature — a
    new producer version shipping an extra/renamed field shows up as
    a new signature row long before anything downstream breaks on the
    missing column. Keys are sorted before signing because the
    profile must be insensitive to producer serialization order (both
    engines' key extractors preserve document order, which is
    exactly the noise to remove).

    Scale: per-row key extraction is a codegen JSON expression; the
    aggregate is map-side combinable on signature strings (bounded by
    schema-variant count, not event count)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.array_join(
            F.array_sort(F.json_object_keys("props")), ","
        ).alias("key_signature")
    ).groupBy("key_signature").agg(F.count("*").alias("n_events"))


@query(
    "timezone_local_date_rollup",
    oracle="""
    SELECT strftime((ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'),
                    '%Y-%m-%d') AS local_date,
           count(*)::BIGINT AS n_events
    FROM events GROUP BY 1
    """,
)
def timezone_local_date_rollup(spark, sf_dir):
    """Timezone-correct daily rollup: UTC event times converted to an
    operating timezone (America/New_York) BEFORE the date bucket —
    the difference between this and a naive UTC date() is every
    business-day report that looked wrong by a few hours, and the DST
    transitions inside the data are the cases a hand-rolled offset
    gets wrong (both engines delegate to the IANA tz database, so
    agreement here certifies the conversion path end to end, spring
    and fall edges included).

    Scale: the conversion is a per-row codegen expression; the rollup
    is one map-side-combinable aggregate on the local date."""
    ev = load_table(spark, sf_dir, "events")
    local = F.convert_timezone(
        F.lit("UTC"), F.lit("America/New_York"), F.col("ts")
    )
    return ev.select(
        F.date_format(local, "yyyy-MM-dd").alias("local_date")
    ).groupBy("local_date").agg(F.count("*").alias("n_events"))


@query(
    "date_trunc_granularity_rollup",
    oracle="""
    SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
             AS quarter_start,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')
             AS week_start,
           count(*)::BIGINT AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_trunc_granularity_rollup(spark, sf_dir):
    """Calendar-truncation semantics across granularities: orders
    rolled up by QUARTER start and ISO WEEK start simultaneously —
    the two truncations with genuine convention risk (does the week
    start Monday or Sunday? does Q1 start Jan 1 or a fiscal month?).
    Hash agreement certifies both engines implement the same ISO
    conventions (Monday weeks, calendar quarters), which is what
    makes truncated keys safe to join across systems — the subtle
    reporting bug this guards against is a Sunday-week system joined
    to a Monday-week one, where 6/7ths of keys silently mismatch.

    Scale: truncation is per-row codegen; the rollup is one map-side
    combinable aggregate on ~400 (quarter, week) keys."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd")
        .alias("quarter_start"),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd")
        .alias("week_start"),
    ).agg(F.count("*").alias("n_orders"))
