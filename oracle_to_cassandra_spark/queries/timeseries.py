"""Time-series primitives over the events stream: forward-fill and
inter-event gap statistics — the imputation/feature ops a telemetry or
training-log pipeline runs before windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "forward_fill_last_purchase_value",
    oracle="""
    SELECT user_id, event_id, event_type,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING), 2) AS last_purchase_value
    FROM events
    """,
)
def forward_fill_last_purchase_value(spark, sf_dir):
    """Forward-fill: carry each user's most recent purchase value onto
    every subsequent event (NULL until the first purchase) — the
    last-observation-carried-forward imputation, one shuffle on
    user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 2).alias(
            "last_purchase_value"
        ),
    )


@query(
    "inter_event_gap_stats",
    oracle="""
    SELECT user_id,
           count(*)::BIGINT AS n_gaps,
           (sum(gap_s)::BIGINT * 1000000 // count(gap_s)) AS avg_gap_s_e6,
           max(gap_s)::BIGINT   AS max_gap_s
    FROM (
      SELECT user_id,
             date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_s
      FROM events
    )
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def inter_event_gap_stats(spark, sf_dir):
    """Inter-event gap statistics per user (lag + diff + aggregate) —
    the cadence features behind sessionization thresholds and anomaly
    flags."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        # exact micro-second-unit mean (int64 div): round over the
        # int/int ratio ties at the half-micro across engines
        F.expr("sum(gap_s) * 1000000 div count(gap_s)").alias("avg_gap_s_e6"),
        F.max("gap_s").alias("max_gap_s"),
    )


@query(
    "scd2_interval_build",
    oracle="""
    WITH versions AS (
      SELECT user_id, ts, value,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           round(value, 2) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), 'CURRENT')
             AS valid_to,
           (next_ts IS NULL) AS is_current
    FROM versions
    """,
)
def scd2_interval_build(spark, sf_dir):
    """Slowly-changing-dimension type-2 history build: turn each
    user's purchase-value change stream into validity intervals
    [valid_from, valid_to) with an open-ended current row — the
    warehouse structure behind every as-of lookup (the as-of JOIN in
    operators/asof.py is the read side; this is the write side that
    materializes it). Ties on ts break on event_id so interval
    boundaries are deterministic in both engines; timestamps ship as
    formatted strings per the repo's cross-engine rules.

    Scale: one lead window per user partition — parallel across the
    user key space, no global sort; output is change-count-sized, and
    in production it MERGEs into the dimension table keyed on
    (user_id, valid_from)."""
    from oracle_to_cassandra_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = ev.select(
        "user_id",
        "ts",
        "value",
        F.lead("ts").over(w).alias("next_ts"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return versions.select(
        "user_id",
        F.round("value", 2).alias("value"),
        F.date_format("ts", fmt).alias("valid_from"),
        F.coalesce(F.date_format("next_ts", fmt), F.lit("CURRENT")).alias(
            "valid_to"
        ),
        F.col("next_ts").isNull().alias("is_current"),
    )


@query(
    "monthly_revenue_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT month, rev_c,
             lag(rev_c, 12) OVER (ORDER BY month)::BIGINT AS prev_c
      FROM monthly
    )
    SELECT strftime(month, '%Y-%m') AS month,
           round(rev_c / 100.0, 2) AS revenue,
           round(prev_c / 100.0, 2) AS revenue_prev_year,
           CASE WHEN prev_c IS NOT NULL
                THEN (rev_c - prev_c) * 10000 // prev_c END AS yoy_growth_e4
    FROM lagged
    """,
)
def monthly_revenue_yoy_growth(spark, sf_dir):
    """Month-over-same-month-last-year growth: monthly revenue with a
    12-step lag and the YoY delta ratio — the other classic BI shape
    next to the calendar spine (which fills GAPS; this compares
    SEASONS). NULL growth for the first year is part of the contract
    (no fabricated baselines).

    Scale: the monthly aggregate is month-count-sized; the lag
    window's total order runs over those ~84 rows, not the orders
    table — bounded by the calendar, the one case where a global
    window is fine at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_c", F.lag("rev_c", 12).over(w))
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.round(F.col("prev_c") / 100.0, 2).alias("revenue_prev_year"),
            # exact e4-unit growth: (Δ·1e4) div prev — int64 in both
            # engines (negative growth truncates identically toward zero)
            F.when(
                F.col("prev_c").isNotNull(),
                F.expr("(rev_c - prev_c) * 10000 div prev_c"),
            ).alias("yoy_growth_e4"),
        )
    )


@query(
    "weekly_event_spike_alerts",
    oracle="""
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS week,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    trailed AS (
      SELECT event_type, week, n,
             avg(n) OVER (PARTITION BY event_type ORDER BY week
                          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS trail_avg
      FROM weekly
    )
    SELECT event_type, strftime(week, '%Y-%m-%d') AS week_start, n,
           round(trail_avg, 2) AS trailing_avg,
           (trail_avg IS NOT NULL AND n > 1.5 * trail_avg) AS is_spike
    FROM trailed
    """,
)
def weekly_event_spike_alerts(spark, sf_dir):
    """Volume-spike alerting: weekly counts per event type against
    the trailing 3-week average (current week EXCLUDED from its own
    baseline — the off-by-one that makes naive moving averages blind
    to the very spike they should flag); a week exceeding 1.5× its
    trailing baseline raises the alert flag. First weeks carry a
    NULL baseline and cannot alert — silence, not a false positive.

    Scale: the weekly rollup is (event-types × weeks)-sized; the
    trailing window partitions per event type over that tiny table.
    In production this is the detector a foreachBatch sink evaluates
    per trigger."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("week")
        .rowsBetween(-3, -1)
    )
    trail = F.avg("n").over(w)
    return weekly.select(
        "event_type",
        F.date_format("week", "yyyy-MM-dd").alias("week_start"),
        "n",
        F.round(trail, 2).alias("trailing_avg"),
        (trail.isNotNull() & (F.col("n") > 1.5 * trail)).alias("is_spike"),
    )
