"""Advanced scale-pattern operators Spark has no native construct for,
each expressed as the composition a 100 TB deployment would actually
run (north-star "custom operator" surface, SURVEY.md §2.6):

  * range (interval) join — rewritten as pre-aggregate + month-bin
    equi-join + residual range filter, instead of the quadratic
    BroadcastNestedLoopJoin a raw inequality join plans to;
  * continuous-aggregate rollup cascade — the hypertable pattern:
    the daily rollup consumes the HOURLY aggregate, not the raw
    events (at 100 TB the raw stream is read once, every coarser
    granularity derives from the finer one);
  * int8 embedding quantization — per-vector max-abs scaling with
    measured reconstruction error (the 4× memory lever before an ANN
    index build), all in codegen'd higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "range_join_shipments_after_order",
    oracle="""
    WITH daily AS (
      SELECT l_shipdate, count(*)::BIGINT AS n_ship FROM lineitem GROUP BY 1
    )
    SELECT o.o_orderkey,
           coalesce(sum(d.n_ship), 0)::BIGINT AS n_shipped_30d
    FROM orders o LEFT JOIN daily d
      ON d.l_shipdate >= o.o_orderdate
     AND d.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
)
def range_join_shipments_after_order(spark, sf_dir):
    """Range join: per order, total corpus shipments in the 30 days
    from its order date — an interval join with NO equi key.

    Scale rewrite: (1) pre-aggregate lineitem to one row per ship
    day (corpus-sized stream → calendar-sized relation), (2) equi-join
    on the month bin — each 30-day interval covers ≤3 month bins, the
    daily side is broadcast — (3) residual exact range filter inside
    the join condition (kept there so the LEFT join stays outer).
    A raw inequality join plans as BroadcastNestedLoopJoin: |orders| ×
    |days| comparisons; the bin join compares each order only against
    its ≤3 months of candidate days.

    r13 note: a calendar prefix-sum rewrite (dense day spine + two
    broadcast boundary equi-joins, no per-order aggregate) was 2×
    faster at sf0.1 but is only correct when both date columns are
    day-granular — the TEMPORAL stress axis (sub-day timestamps)
    caught it dropping every order whose clamped boundary fell on a
    non-midnight extremum, and the exact general form needs an as-of
    join, which is this month-bin plan again. Reverted; this form
    compares raw timestamp values inside the join condition and is
    total over any temporal granularity."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy("l_shipdate").agg(F.count("*").alias("n_ship")).withColumn(
        "mbin", F.date_trunc("month", "l_shipdate")
    )
    win_end = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    binned = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.explode(
            F.array_distinct(
                F.sequence(
                    F.date_trunc("month", "o_orderdate"),
                    F.date_trunc("month", win_end),
                    F.expr("INTERVAL 1 MONTH"),
                )
            )
        ).alias("mbin"),
    )
    joined = binned.join(
        F.broadcast(daily),
        (binned.mbin == daily.mbin)
        & (daily.l_shipdate >= binned.o_orderdate)
        & (daily.l_shipdate < binned.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left",
    )
    return joined.groupBy("o_orderkey").agg(
        F.coalesce(F.sum("n_ship"), F.lit(0)).cast("long").alias("n_shipped_30d")
    )


@query(
    "rollup_cascade_hourly_daily",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(DISTINCT date_trunc('hour', ts))::BIGINT AS n_active_hours,
           count(*)::BIGINT     AS n_events,
           (sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT // 10000)
             AS total_value_c
    FROM events GROUP BY 1
    """,
)
def rollup_cascade_hourly_daily(spark, sf_dir):
    """Continuous-aggregate cascade: daily rollup computed FROM the
    hourly rollup (counts and sums re-aggregate losslessly; rounding
    only at the final grain). The oracle aggregates the raw events
    directly — equality proves the cascade is exact.

    Scale: the raw 100 TB stream is scanned once for the hourly
    grain; the daily pass reads |hours| rows, ~5 orders of magnitude
    smaller. This is the hypertable/materialized-rollup pattern as a
    two-level groupBy."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("sv_u"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("w.start")).alias("day")
    ).agg(
        F.count("*").alias("n_active_hours"),
        F.sum("n_events").alias("n_events"),
        # integer cents via one int64 div — a final float round here
        # ties at half-cents and the engines round ties differently
        F.expr("sum(sv_u) div 10000").alias("total_value_c"),
    )
    return daily.select(
        F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_active_hours",
        "n_events",
        "total_value_c",
    )


@query(
    "embedding_int8_quantization",
    oracle="""
    SELECT vec_id, len(e)::INT AS dim,
           round(s / 127, 6) AS qscale,
           CASE WHEN s = 0 THEN 0.0 ELSE
             round(list_max(list_transform(
               e, x -> abs(x - round(x * 127 / s) * s / 127))), 6)
           END AS max_abs_err
    FROM (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS s
      FROM embeddings
    )
    """,
)
def embedding_int8_quantization(spark, sf_dir):
    """Symmetric int8 quantization per vector: scale = max|x|/127,
    q = round(x/scale), with the max reconstruction error measured in
    the same pass — the storage/bandwidth lever (float32 → int8 is 4×)
    applied before building an ANN index at 100 TB.

    All arithmetic is identical double-precision expressions in both
    engines (same ops, same element order → bit-identical), so the
    6-dp rounded outputs hash-match. 64-dim vectors keep the
    re-evaluated max-abs subexpression cheap (higher-order funcs get
    no CSE; this would need a two-step materialization at 4k dims)."""
    e = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731

    def maxabs():
        return F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: F.greatest(a, F.abs(xd(x)))
        )

    s = maxabs()
    err = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda a, x: F.greatest(
            a, F.abs(xd(x) - F.round(xd(x) * 127 / maxabs()) * maxabs() / 127)
        ),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(s / 127, 6).alias("qscale"),
        F.when(s == 0, F.lit(0.0)).otherwise(F.round(err, 6)).alias("max_abs_err"),
    )


@query(
    "incremental_rollup_merge",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*)::BIGINT AS n_events,
           (sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT // 1000000)
             AS total_value_whole,
           (sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT // count(*))
             AS avg_value_micro
    FROM events GROUP BY 1
    """,
)
def incremental_rollup_merge(spark, sf_dir):
    """Incremental materialized-rollup maintenance: a daily aggregate
    'state table' (events before the cutoff) merged with a
    late-arriving delta (events at/after the cutoff) by re-aggregating
    the PARTIAL states — sum-of-sums, sum-of-counts — never the raw
    history. The oracle aggregates all raw events in one pass;
    equality proves the merge is lossless.

    The decomposition rule this demonstrates: only keep MERGEABLE
    partials in the state table (count, sum — and sketches, see
    hll_sketch_union_rollup). avg is NOT mergeable, so it is derived
    from sum/count at read time, never stored.

    Scale: the nightly job re-aggregates |days| state rows plus one
    day of delta instead of re-scanning the 100 TB history; the
    cutoff predicate pushes into both scans so each side reads only
    its partition range."""
    # the cutoff predicate compares the native ts column against a
    # TYPED timestamp literal so it pushes into the parquet scan
    # (PushedFilters — plan-asserted); any cutoff partitions the data
    # disjointly. Partials are INTEGER micro-unit sums, which is the
    # real mergeable-state rule: int64 partials re-aggregate in any
    # order to the same value, so the merged rollup equals the
    # oracle's single pass exactly — no rounding-granularity hedging
    # (0-dp/2-dp compromises) needed anymore.
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit("2024-01-20 00:00:00"))

    def daily_partial(df):
        return df.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("sv_u"),
        )

    state = daily_partial(ev.filter(F.col("ts") < cutoff))
    delta = daily_partial(ev.filter(F.col("ts") >= cutoff))
    merged = (
        state.unionByName(delta)
        .groupBy("day")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sv_u").alias("sv_u"))
    )
    return merged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        # integer units only: whole-value floor and exact micro mean
        # (int64 div both engines) — final float rounds tie-flip
        F.expr("sv_u div 1000000").alias("total_value_whole"),
        F.expr("sv_u div n_events").alias("avg_value_micro"),
    )
