"""Subquery surface: scalar, IN, correlated EXISTS, derived tables —
SQL shapes any engine user expects even though the reference never
uses them (its FK walks are manual point queries, README.md:317-394).

Scale notes: Catalyst de-correlates these into joins — scalar
subqueries become broadcast scalars, IN → left-semi, NOT EXISTS →
left-anti; none fall back to per-row re-execution.
"""

from __future__ import annotations

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import register_views


@query(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > (SELECT (sum(CAST(round(o_totalprice * 100)
                                           AS BIGINT))::BIGINT / 100.0)
                                 / count(o_totalprice) FROM orders)
    """,
)
def scalar_subquery_above_avg(spark, sf_dir):
    """Scalar subquery: orders above the global average price."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > (SELECT (sum(CAST(round(o_totalprice * 100)
                                               AS BIGINT)) / 100.0D)
                                     / count(o_totalprice) FROM orders)
        """
    )


@query(
    "in_subquery_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
)
def in_subquery_customers(spark, sf_dir):
    """IN subquery → left-semi join after de-correlation."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )


@query(
    "correlated_exists_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def correlated_exists_orders(spark, sf_dir):
    """Correlated EXISTS → left-semi join on the correlation key."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        """
    )


@query(
    "not_exists_anti_join",
    oracle="""
    SELECT c_custkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def not_exists_anti_join(spark, sf_dir):
    """NOT EXISTS → left-anti join: customers with no orders."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """
    )


@query(
    "derived_table_top_segment",
    oracle="""
    SELECT s.c_mktsegment, s.n_orders
    FROM (
      SELECT c.c_mktsegment, count(*)::BIGINT AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ) s
    WHERE s.n_orders > 100
    """,
)
def derived_table_top_segment(spark, sf_dir):
    """Derived table (subquery in FROM) + outer filter."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT s.c_mktsegment, s.n_orders
        FROM (
          SELECT c.c_mktsegment, count(*) AS n_orders
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_mktsegment
        ) s
        WHERE s.n_orders > 100
        """
    )
