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

from pyspark.sql import Window
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

    Scale rewrite (r14, guide §2.3/§2.4 — prefix sums keyed on EXACT
    boundary timestamps): (1) pre-aggregate lineitem to one row per
    distinct ship time (corpus-sized stream → calendar-sized spine),
    (2) derive each distinct order date's two window boundaries
    (t, t+30d) and compute cum_below(b) = Σ n_ship over ship times
    STRICTLY below b with ONE running sum over the union of spine rows
    and boundary marks — marks sort before spine rows at equal time,
    so the strict bound is exact at any temporal granularity (raw
    timestamp values throughout; nothing is truncated to a day grid),
    (3) each order's answer is cum_below(t+30d) − cum_below(t),
    attached by a broadcast equi-join on its order date. No per-order
    aggregate, no row multiplication: the orders side is scanned once,
    exchange-free past its dictionary `distinct`.

    The union+running-sum relation is boundary+spine sized (distinct
    times, not rows — calendar-sized for real workloads), so its
    single-partition window is the repo's standard tiny-relation
    attach, not a data-sized global sort.

    r13 note (why not a day-calendar prefix sum): a dense day spine
    was 2× faster but only correct with day-granular dates — the
    TEMPORAL stress axis (sub-day timestamps) caught it dropping every
    order whose clamped boundary fell on a non-midnight extremum.
    This form keys the prefix sum on the exact boundary VALUES
    instead, so no grid exists to truncate to."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy("l_shipdate").agg(F.count("*").alias("n_ship"))
    # boundary marks: two per distinct order date — the window's
    # half-open [t, t+30d) endpoints, compared as raw values
    marks = (
        orders.select("o_orderdate")
        .distinct()
        .select(
            F.col("o_orderdate").alias("t"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lo").alias("which"),
                        F.col("o_orderdate")
                        .cast("timestamp")
                        .alias("tick"),
                    ),
                    F.struct(
                        F.lit("hi").alias("which"),
                        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
                        .cast("timestamp")
                        .alias("tick"),
                    ),
                )
            ).alias("b"),
        )
        .select("t", F.col("b.which").alias("which"), F.col("b.tick").alias("tick"))
    )
    spine = daily.select(
        F.col("l_shipdate").cast("timestamp").alias("tick"),
        F.lit(1).alias("kind"),  # marks (kind 0) sort FIRST at a tie:
        # cum at a mark then excludes equal-time shipments — exactly
        # the strict d < b the half-open window needs on both ends
        F.col("n_ship"),
        F.lit(None).cast(orders.schema["o_orderdate"].dataType).alias("t"),
        F.lit(None).cast("string").alias("which"),
    )
    u = marks.select(
        "tick", F.lit(0).alias("kind"), F.lit(0).cast("long").alias("n_ship"),
        "t", "which",
    ).unionByName(spine)
    # running sum over (tick, kind): ties among marks all carry 0, so
    # their relative order cannot change any cum; NULL order dates
    # (possible under stress axes) sort first and read cum 0 → 0
    # shipments, matching the oracle's never-true range predicate
    w = (
        Window.orderBy(F.col("tick").asc_nulls_first(), "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = (
        u.withColumn("cum", F.sum("n_ship").over(w))
        .filter(F.col("kind") == 0)
        .groupBy("t")
        .agg(
            F.max(F.when(F.col("which") == "lo", F.col("cum"))).alias("c_lo"),
            F.max(F.when(F.col("which") == "hi", F.col("cum"))).alias("c_hi"),
        )
    )
    # eqNullSafe: a NULL-dated order must still meet its NULL mark row
    return orders.join(
        F.broadcast(cums), orders.o_orderdate.eqNullSafe(cums.t)
    ).select(
        "o_orderkey",
        (F.col("c_hi") - F.col("c_lo")).cast("long").alias("n_shipped_30d"),
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
