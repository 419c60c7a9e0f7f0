"""Window-function queries: ranking, analytic, frames (SURVEY.md §7.2
step 4). All ranking windows carry a unique tie-break so the output is
deterministic for the driver's hash compare.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators.windows import top_k_per_group
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "topk_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_orders_per_customer(spark, sf_dir):
    """Top-3 orders per customer — the canonical top-k-per-group.
    Scale: WindowGroupLimit prunes to ≤3 candidates per group per input
    partition before the sort; one shuffle on o_custkey."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice")
    )
    return top_k_per_group(
        orders,
        ["o_custkey"],
        [F.desc("totalprice"), F.asc("o_orderkey")],
        k=3,
    )


@query(
    "rank_dense_rank_orders",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_custkey)::BIGINT AS rnk,
           dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_custkey)::BIGINT AS drnk
    FROM orders
    """,
)
def rank_dense_rank_orders(spark, sf_dir):
    """rank vs dense_rank with ties (many orders share a custkey within
    a priority): tied rows get equal rank on both sides → deterministic
    without a tie-break."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_custkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "lag_lead_user_events",
    oracle="""
    SELECT user_id, event_id,
           round(value, 2) AS value,
           round(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
           round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_value
    FROM events
    """,
)
def lag_lead_user_events(spark, sf_dir):
    """Analytic lag/lead over each user's event timeline (event_id
    tie-break for equal timestamps). First/last rows yield NULLs —
    identical on both sides."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@query(
    "running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             / 100.0, 2) AS running_total
    FROM orders
    """,
)
def running_total_per_customer(spark, sf_dir):
    """Aggregate-over-frame: cumulative sum ordered by the unique
    clustering key, accumulated in exact integer cents (an ordered fp
    frame is deterministic per engine but both engines' op ORDER must
    still agree; cents make the question moot)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w)
            / 100.0,
            2,
        ).alias("running_total"),
    )


@query(
    "moving_avg_3_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT
            // count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS avg3_c
    FROM orders
    """,
)
def moving_avg_3_orders(spark, sf_dir):
    """Bounded ROWS frame: 3-row moving average."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, 0)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .over(w)
            .alias("s_c"),
            F.count("*").over(w).alias("n_w"),
        )
        # exact integer-cents window mean (int64 div): the float form
        # ties at the half-cent whenever the frame count divides the
        # cents sum on a half
        .select(
            "o_custkey",
            "o_orderkey",
            F.expr("s_c div n_w").alias("avg3_c"),
        )
    )


@query(
    "range_frame_value_neighborhood",
    oracle="""
    SELECT l_partkey, l_quantity,
           count(*) OVER (PARTITION BY l_partkey ORDER BY l_quantity
                          RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)::BIGINT AS n_similar
    FROM lineitem
    """,
)
def range_frame_value_neighborhood(spark, sf_dir):
    """RANGE frame on a numeric ordering column: how many lines of the
    same part have quantity within ±5 — a value-based (not row-based)
    frame."""
    w = Window.partitionBy("l_partkey").orderBy("l_quantity").rangeBetween(-5, 5)
    return load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        F.count("*").over(w).cast("long").alias("n_similar"),
    )


@query(
    "ntile_quartiles",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)::BIGINT AS quartile
    FROM orders
    """,
)
def ntile_quartiles(spark, sf_dir):
    """ntile bucketing (unique tie-break → deterministic buckets).
    Scale note: a global ORDER BY window runs on ONE task — acceptable
    for bucketing *samples*; at 100 TB use approx quantile cutpoints +
    a join instead."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.ntile(4).over(w).cast("long").alias("quartile")
    )


@query(
    "percent_rank_cume_dist",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal NULLS FIRST), 6) AS pr,
           round(cume_dist()    OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal NULLS FIRST), 6) AS cd
    FROM customer
    """,
)
def percent_rank_cume_dist(spark, sf_dir):
    """Distribution functions — tie rows receive equal values on both
    sides, so no tie-break needed. NULL placement is pinned explicitly
    (NULLS FIRST both engines): Spark's ASC default is nulls-first,
    DuckDB's is nulls-last, so an unpinned ORDER BY over a nullable
    sort key silently diverges the moment the column acquires NULLs
    (caught by the null-injection stress sweep, NULL_SWEEP.json)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc_nulls_first("c_acctbal")
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "first_last_value_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    """,
)
def first_last_value_frames(spark, sf_dir):
    """first_value/last_value over the full-partition frame (the
    default frame would make last_value = current row — the classic
    trap; pin the frame explicitly)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@query(
    "window_distribution_functions",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT)
             AS pct_rank_ppm,
           CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT)
             AS cume_dist_ppm,
           CAST(round(nth_value(c_acctbal, 3) OVER (
             PARTITION BY c_mktsegment
             ORDER BY c_acctbal NULLS FIRST, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) * 100) AS BIGINT) AS third_lowest_bal_cents
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal NULLS FIRST, c_custkey)
    ORDER BY c_mktsegment, pct_rank_ppm, c_custkey
    LIMIT 200
    """,
)
def window_distribution_functions(spark, sf_dir):
    """The DISTRIBUTION window family — percent_rank (relative rank in
    [0,1]), cume_dist (fraction of rows at-or-below), nth_value (the
    k-th value of the full frame) — per market segment over account
    balances. The floats are emitted as ppm integers derived from the
    built-ins: both engines compute (rank−1)/(n−1) as the same
    correctly-rounded division of the same integers, so the floored
    ppm is engine-exact without a rounding-boundary hazard (the
    `round(x, 6)` form is the family that flipped at sf0.1).
    Ordering carries a unique tiebreak so ranks are total.

    Scale: one window per segment partition; nth_value with an
    unbounded frame evaluates once per partition, not per row. NULL
    placement pinned NULLS FIRST in both engines (Spark's ASC default
    vs DuckDB's nulls-last — see percent_rank_cume_dist)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc_nulls_first("c_acctbal"), "c_custkey"
    )
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.floor(F.percent_rank().over(w) * 1000000)
            .cast("long")
            .alias("pct_rank_ppm"),
            F.floor(F.cume_dist().over(w) * 1000000)
            .cast("long")
            .alias("cume_dist_ppm"),
            F.round(F.nth_value("c_acctbal", 3).over(w_full) * 100)
            .cast("long")
            .alias("third_lowest_bal_cents"),
        )
        .orderBy("c_mktsegment", "pct_rank_ppm", "c_custkey")
        .limit(200)
    )
