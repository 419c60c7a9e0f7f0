"""Extended join surface: outer joins (absent from the reference —
SURVEY.md §2.3 "equi-join only, inner only") and the as-of temporal
join (custom operator, operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators.asof import asof_join
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "left_outer_customer_orders",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey)::BIGINT            AS n_orders,
           round(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)),
                          0)::BIGINT / 100.0, 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def left_outer_customer_orders(spark, sf_dir):
    """LEFT OUTER join preserving order-less customers (count=0,
    spend=0) — the null-extension semantics the reference never
    exercises."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                    F.lit(0).cast("long"),
                )
                / 100.0,
                2,
            ).alias("total_spend"),
        )
    )


@query(
    "full_outer_key_reconciliation",
    oracle="""
    SELECT coalesce(a.k, b.k) AS custkey,
           (a.k IS NOT NULL)::INT AS in_building,
           (b.k IS NOT NULL)::INT AS has_urgent
    FROM (SELECT DISTINCT c_custkey AS k FROM customer
          WHERE c_mktsegment = 'BUILDING') a
    FULL OUTER JOIN (SELECT DISTINCT o_custkey AS k FROM orders
                     WHERE o_orderpriority = '1-URGENT') b
      ON a.k = b.k
    """,
)
def full_outer_key_reconciliation(spark, sf_dir):
    """FULL OUTER join as a key-reconciliation report — which keys
    exist on each side (the classic data-quality diff)."""
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    joined = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full")
    return joined.select(
        F.coalesce(F.col("a.k"), F.col("b.k")).alias("custkey"),
        F.col("a.k").isNotNull().cast("int").alias("in_building"),
        F.col("b.k").isNotNull().cast("int").alias("has_urgent"),
    )


@query(
    "asof_join_last_purchase",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           (SELECT p.event_id FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts <= e.ts
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS asof_event_id,
           (SELECT round(p.value, 2) FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts <= e.ts
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS asof_value
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def asof_join_last_purchase(spark, sf_dir):
    """As-of join: each error event matched to the user's most recent
    purchase at-or-before it (NULL when none). Spark side uses the
    linear union+window operator (operators/asof.py — one shuffle, no
    range cross-join); the oracle states the semantics as correlated
    argmax subqueries."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.round("value", 2).alias("p_value"),
    )
    joined = asof_join(
        errors,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        payload_cols=["p_event_id", "p_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.col("asof_p_event_id").alias("asof_event_id"),
        F.col("asof_p_value").alias("asof_value"),
    )


ASOF_TOLERANCE_H = 48  #: feature-freshness window


@query(
    "asof_join_with_tolerance",
    oracle=f"""
    WITH matched AS (
      SELECT e.event_id, e.user_id,
             (SELECT round(p.value, 2) FROM events p
              WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                AND p.ts <= e.ts
              ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS raw_value,
             (SELECT p.ts FROM events p
              WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                AND p.ts <= e.ts
              ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS match_ts,
             e.ts
      FROM events e WHERE e.event_type = 'error'
    )
    SELECT event_id, user_id,
           CASE WHEN match_ts IS NOT NULL
                     AND epoch(ts) - epoch(match_ts)
                         <= {ASOF_TOLERANCE_H} * 3600
                THEN raw_value END AS fresh_value,
           CASE WHEN match_ts IS NOT NULL
                THEN round(epoch(ts) - epoch(match_ts), 2) END AS staleness_s,
           (match_ts IS NOT NULL
            AND epoch(ts) - epoch(match_ts) > {ASOF_TOLERANCE_H} * 3600)
             AS is_stale
    FROM matched
    """,
)
def asof_join_with_tolerance(spark, sf_dir):
    """As-of join with a freshness tolerance — the feature-store
    serving contract: a feature older than {ASOF_TOLERANCE_H}h at
    lookup time must NOT be served (stale features silently poison a
    model); the match is kept as NULL-with-staleness so monitoring
    can count how often the tolerance bites vs no-match-at-all. Same
    linear union+window operator as the plain as-of; the tolerance
    is a post-filter on the matched timestamp, NOT a different join
    algorithm.

    Scale: identical plan to asof_join_last_purchase (one shuffle on
    the key, per-key window) plus scan-side arithmetic — tolerance
    adds zero data movement."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.round("value", 2).alias("p_value"),
    )
    # payload LEADS with p_event_id: the operator breaks equal-ts
    # ties by the largest payload struct, and the oracle's argmax
    # orders by (ts DESC, event_id DESC) — leading with p_ts (equal
    # among the tied rows) would fall through to max VALUE and
    # diverge whenever two purchases share a timestamp (caught by
    # the temporal stress sweep's deliberate ts collisions)
    joined = asof_join(
        errors,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        payload_cols=["p_event_id", "p_ts", "p_value"],
    )
    age = (
        F.unix_micros("ts") / 1e6 - F.unix_micros("asof_p_ts") / 1e6
    )
    fresh = age <= ASOF_TOLERANCE_H * 3600
    return joined.select(
        "event_id",
        "user_id",
        F.when(F.col("asof_p_ts").isNotNull() & fresh, F.col("asof_p_value")).alias(
            "fresh_value"
        ),
        F.when(F.col("asof_p_ts").isNotNull(), F.round(age, 2)).alias(
            "staleness_s"
        ),
        (F.col("asof_p_ts").isNotNull() & ~fresh).alias("is_stale"),
    )


@query(
    "null_safe_join_reconciliation",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
                  ELSE o_orderpriority END AS pri_key,
             count(*)::BIGINT AS n_src
      FROM orders GROUP BY 1
    ),
    dst AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
                  ELSE o_orderpriority END AS pri_key,
             count(*)::BIGINT AS n_dst
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
    )
    SELECT s.pri_key, s.n_src, d.n_dst
    FROM src s JOIN dst d ON s.pri_key IS NOT DISTINCT FROM d.pri_key
    """,
)
def null_safe_join_reconciliation(spark, sf_dir):
    """NULL-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the
    join predicate under which NULL matches NULL — required whenever
    the join key is a DERIVED nullable (here a priority code with one
    value nulled out, the shape every sentinel-to-NULL cleanup
    produces). A plain equi-join silently DROPS the NULL group on
    both sides; the reconciliation row for the nulled key is exactly
    what it would lose.

    Scale: eqNullSafe compiles to the same hash join as ``=`` (the
    null bucket hashes like any value) — no nested-loop fallback, and
    the tiny grouped sides broadcast."""
    o = load_table(spark, sf_dir, "orders")
    key = F.when(
        F.col("o_orderpriority") == "1-URGENT", F.lit(None)
    ).otherwise(F.col("o_orderpriority"))
    src = o.groupBy(key.alias("pri_key")).agg(F.count("*").alias("n_src"))
    dst = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy(key.alias("pri_key"))
        .agg(F.count("*").alias("n_dst"))
    )
    d = dst.withColumnRenamed("pri_key", "pri_key_d")
    return src.join(
        F.broadcast(d), src.pri_key.eqNullSafe(d.pri_key_d)
    ).select("pri_key", "n_src", "n_dst")
