"""Cohort analytics over the events stream: weekly retention matrix
and per-cohort value — the standard product-analytics rollup, built
from first-touch assignment + conditional pivots.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT e.user_id,
             strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
             date_diff('week', date_trunc('week', f.first_ts),
                       date_trunc('week', e.ts))::INT AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week,
           count(DISTINCT user_id)::BIGINT AS cohort_size,
           count(DISTINCT CASE WHEN week_offset = 1 THEN user_id END)::BIGINT AS week1,
           count(DISTINCT CASE WHEN week_offset = 2 THEN user_id END)::BIGINT AS week2,
           count(DISTINCT CASE WHEN week_offset = 3 THEN user_id END)::BIGINT AS week3
    FROM activity GROUP BY cohort_week
    """,
)
def cohort_weekly_retention(spark, sf_dir):
    """Weekly retention: users grouped by first-seen week, counted
    distinct in each subsequent week offset — first-touch assignment
    joined back to the activity stream, then conditional distinct
    counts (one shuffle for firsts, one for the matrix).

    Scale: ``firsts`` is user-cardinality — NOT broadcastable at
    100 TB, so no broadcast hint; the join shuffles on user_id (AQE
    still broadcasts it at small SF where it fits)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    activity = ev.join(firsts, "user_id").select(
        "user_id",
        F.date_format(F.date_trunc("week", "first_ts"), "yyyy-MM-dd").alias("cohort_week"),
        (
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")),
                    F.date_trunc("week", F.col("first_ts")),
                )
                / 7
            )
        ).cast("int").alias("week_offset"),
    )
    def wk(n):
        return F.count_distinct(
            F.when(F.col("week_offset") == n, F.col("user_id"))
        ).alias(f"week{n}")

    return activity.groupBy("cohort_week").agg(
        F.count_distinct("user_id").alias("cohort_size"), wk(1), wk(2), wk(3)
    )
