"""Statistical aggregate surface: correlation, covariance, linear
regression, bitwise aggregation, argmax selection, approximate
quantiles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "correlation_price_quantity",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6)       AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def correlation_price_quantity(spark, sf_dir):
    """Pearson correlation + sample covariance per group — one-pass
    co-moment aggregates (partial-aggregatable, shuffle carries the
    moment tuples)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("price_qty_covar"),
    )


@query(
    "linear_regression_price_size",
    oracle="""
    SELECT p_brand,
           round(regr_slope(p_retailprice, p_size), 6)     AS slope,
           round(regr_intercept(p_retailprice, p_size), 6) AS intercept,
           round(regr_r2(p_retailprice, p_size), 6)        AS r2,
           regr_count(p_retailprice, p_size)::BIGINT       AS n
    FROM part GROUP BY p_brand
    """,
)
def linear_regression_price_size(spark, sf_dir):
    """Per-group OLS fit (slope/intercept/R²) via the regr_* aggregate
    family — a full regression in one distributed pass, no iteration."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.round(F.regr_slope("p_retailprice", "p_size"), 6).alias("slope"),
        F.round(F.regr_intercept("p_retailprice", "p_size"), 6).alias("intercept"),
        F.round(F.regr_r2("p_retailprice", "p_size"), 6).alias("r2"),
        F.regr_count("p_retailprice", "p_size").alias("n"),
    )


@query(
    "bitwise_aggregates",
    oracle="""
    SELECT user_id,
           bit_and(event_id) AS id_and,
           bit_or(event_id)  AS id_or,
           bit_xor(event_id) AS id_xor
    FROM events GROUP BY user_id
    """,
)
def bitwise_aggregates(spark, sf_dir):
    """Bitwise AND/OR/XOR aggregation — flag-mask folding."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.bit_and("event_id").alias("id_and"),
        F.bit_or("event_id").alias("id_or"),
        F.bit_xor("event_id").alias("id_xor"),
    )


@query(
    "argmax_latest_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS latest_orderkey,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey)           AS first_orderkey
    FROM orders
    """,
)
def argmax_latest_order(spark, sf_dir):
    """max_by/min_by argmax selection ordered by a (date, key) STRUCT —
    lexicographic comparison, so date ties resolve on the key with no
    domain assumption. (An earlier arithmetic packing
    ``epoch*1e7 + key`` silently broke once o_orderkey ≥ 1e7, i.e.
    TPC-H sf≥10 — struct ordering has no such cliff.)"""
    o = load_table(spark, sf_dir, "orders")
    ordv = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordv).alias("latest_orderkey"),
        F.min_by("o_orderkey", ordv).alias("first_orderkey"),
    )


@query(
    "approx_count_distinct_custkeys",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)::BIGINT AS n_custs_exact,
           TRUE                              AS approx_within_tol
    FROM orders GROUP BY o_orderstatus
    """,
)
def approx_count_distinct_custkeys(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB distinct-count
    path: constant memory per group, one pass, no distinct shuffle.

    Sketch values are implementation-defined, so the hash-checkable
    contract is: the exact distinct count PLUS a boolean asserting the
    sketch landed within tolerance. rsd=0.05 with a 12% tolerance:
    measured deviation is ≤5.7% at sf0.001–0.1 (HLL is deterministic
    per dataset, so the boolean is stable), and the 0.05 sketch costs
    ~3× less than rsd=0.02 — the right precision/cost point when the
    guarded bound is 12%. The oracle emits the exact count and literal
    TRUE — a drifting sketch flips the boolean and fails the hash."""
    base = load_table(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_custs_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("_approx"),
    )
    tol = F.greatest(F.col("n_custs_exact") * 0.12, F.lit(10.0))
    return base.select(
        "o_orderstatus",
        "n_custs_exact",
        (F.abs(F.col("_approx") - F.col("n_custs_exact")) <= tol).alias(
            "approx_within_tol"
        ),
    )


@query(
    "approx_quantiles_acctbal",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 2) AS p25,
           round(quantile_cont(c_acctbal, 0.50), 2) AS p50,
           round(quantile_cont(c_acctbal, 0.75), 2) AS p75,
           TRUE AS approx_within_tol
    FROM customer GROUP BY c_mktsegment
    """,
)
def approx_quantiles_acctbal(spark, sf_dir):
    """percentile_approx (KLL-style sketch) — the one-pass bounded-
    memory quantile path for 100 TB (exact percentile sorts per
    group).

    Sketch output is implementation-defined, so the hash-checkable
    contract mirrors ``approx_count_distinct_custkeys``: the EXACT
    interpolated quartiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``) plus a boolean asserting every sketch quartile
    landed within one group IQR of its exact twin. The sketch returns
    an order statistic adjacent to the true quantile (accuracy=10000
    → rank error ≤ max(1, 1e-4·n)), and exact interpolates between
    adjacent order statistics — so the gap is at most a few adjacent-
    value spacings, far inside the IQR at every SF (a fixed absolute
    tolerance breaks at tiny SF where spacings are wide)."""
    c = load_table(spark, sf_dir, "customer")
    base = c.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", F.lit([0.25, 0.5, 0.75])).alias("_exact"),
        F.percentile_approx("c_acctbal", [0.25, 0.5, 0.75], 10000).alias("_approx"),
    )
    tol = F.greatest(
        F.element_at("_exact", 3) - F.element_at("_exact", 1), F.lit(50.0)
    )
    within = F.forall(
        F.zip_with(
            F.col("_exact"),
            F.col("_approx"),
            lambda e, a: F.abs(e - a) <= tol,
        ),
        lambda ok: ok,
    )
    return base.select(
        "c_mktsegment",
        F.round(F.element_at("_exact", 1), 2).alias("p25"),
        F.round(F.element_at("_exact", 2), 2).alias("p50"),
        F.round(F.element_at("_exact", 3), 2).alias("p75"),
        within.alias("approx_within_tol"),
    )
