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
    SELECT o_custkey,
           max_by(o_orderkey, epoch(o_orderdate)::BIGINT * 10000000 + o_orderkey)
             AS latest_orderkey,
           min_by(o_orderkey, epoch(o_orderdate)::BIGINT * 10000000 + o_orderkey)
             AS first_orderkey
    FROM orders GROUP BY o_custkey
    """,
)
def argmax_latest_order(spark, sf_dir):
    """max_by/min_by argmax selection with a composite (date, key)
    integer ordering so ties on the date resolve deterministically —
    'latest/first order per customer' without a window."""
    o = load_table(spark, sf_dir, "orders")
    ordv = F.unix_timestamp("o_orderdate") * 10000000 + F.col("o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordv).alias("latest_orderkey"),
        F.min_by("o_orderkey", ordv).alias("first_orderkey"),
    )


@query("approx_quantiles_acctbal")  # sketch-based: no exact SQL oracle
def approx_quantiles_acctbal(spark, sf_dir):
    """percentile_approx (KLL-style sketch) — the one-pass bounded-
    memory quantile path for 100 TB (exact percentile sorts per
    group). Sketch output is implementation-defined → rows-only
    check; the exact twin ``stats_dispersion_per_segment`` carries
    the DuckDB oracle."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.percentile_approx("c_acctbal", [0.25, 0.5, 0.75], 10000).alias("quartiles")
    )
