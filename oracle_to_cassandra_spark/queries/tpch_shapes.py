"""Classic TPC-H query shapes on the test star schema — the headline
analytical patterns any engine is judged on (Q1 lives in
queries/aggregates.py as ``tpch_q1_pricing_summary``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators import relational as R
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
               AS BIGINT))::BIGINT AS revenue_cents,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment filter on the dimension, date filters on
    both facts, revenue per unshipped order.

    Scale: both date filters push into the parquet scans BEFORE the
    fact-fact shuffle; the customer filter shrinks the broadcast side.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    # integer cents summed, not a rounded float SUM: the per-row
    # product double is identical in both engines, but a float sum's
    # accumulation ORDER is not — round(sum(...), 2) flipped by 0.01
    # at sf0.1 (observed); round each product to cents, sum exactly
    return joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("revenue_cents")
    ).select(
        "l_orderkey",
        "revenue_cents",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_orderpriority",
    )


@query(
    "tpch_q6_revenue_change",
    oracle="""
    SELECT (sum(CAST(round(l_extendedprice * l_discount * 10000)
                       AS BIGINT))::BIGINT // 100) AS revenue_c,
           count(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + global aggregate — the pushdown
    showcase (every predicate reaches the scan; the 'shuffle' is one
    partial-agg row per partition)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # integer cents (int64 div of the exact 1e-4-unit sum): a
            # final round(sum/1e4, 2) ties at half-cents, where the
            # engines' round implementations disagree
            F.expr(
                """sum(CAST(round(l_extendedprice * l_discount * 10000)
                           AS BIGINT)) div 100"""
            ).alias("revenue_c"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS n_name,
           (sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 10000) AS BIGINT))::BIGINT // 10000)
             AS revenue_whole
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer — fact⋈fact
    shuffle plus two broadcast dimensions, grouped on a mid-cardinality
    key (one row per customer).

    Revenue rounds to INTEGER dollars: per-customer sums of thousands
    of products land within ~1e-7 of a cent boundary often enough that
    2-dp rounding flips between engines (accumulation order); integer
    rounding puts the boundary 100× further away."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    joined = R.fk_chain_join(
        li,
        [
            (o, li.l_orderkey == o.o_orderkey, False),
            (c, o.o_custkey == c.c_custkey, True),
            (n, c.c_nationkey == n.n_nationkey, True),
        ],
    )
    return joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.expr(
            """sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) div 10000"""
        ).alias("revenue_whole")
    )
