"""Set operations (SURVEY.md §2.6 — absent in the reference, required
by the extension surface): UNION ALL / UNION DISTINCT / INTERSECT /
EXCEPT.

Scale notes: UNION ALL is free (plan concatenation, no shuffle);
DISTINCT/INTERSECT/EXCEPT shuffle on the full row — project to the
minimal columns first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


def _building_custkeys(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


def _filled_order_custkeys(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )


@query(
    "union_all_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_all_custkeys(spark, sf_dir):
    """UNION ALL — bag union, duplicates kept, no shuffle."""
    return _building_custkeys(spark, sf_dir).union(
        _filled_order_custkeys(spark, sf_dir)
    )


@query(
    "union_distinct_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_distinct_custkeys(spark, sf_dir):
    """UNION (distinct) — one dedup shuffle over the single projected
    column."""
    return (
        _building_custkeys(spark, sf_dir)
        .union(_filled_order_custkeys(spark, sf_dir))
        .distinct()
    )


@query(
    "intersect_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_custkeys(spark, sf_dir):
    """INTERSECT — BUILDING customers who have a filled order.
    Physically a left-semi hash join after dedup."""
    return _building_custkeys(spark, sf_dir).intersect(
        _filled_order_custkeys(spark, sf_dir)
    )


@query(
    "except_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_custkeys(spark, sf_dir):
    """EXCEPT — BUILDING customers with no filled order (left-anti
    join). ``subtract`` is EXCEPT DISTINCT, matching SQL set-except."""
    return _building_custkeys(spark, sf_dir).subtract(
        _filled_order_custkeys(spark, sf_dir)
    )


@query(
    "semi_anti_join_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           (CASE WHEN EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
                 THEN 1 ELSE 0 END)::INT AS has_urgent
    FROM customer c
    """,
)
def semi_anti_join_customers(spark, sf_dir):
    """Semi/anti-join surface (EXISTS / NOT EXISTS) — join types the
    reference never uses but any engine must have. Expressed as an
    existence flag so one query covers both.

    Scale: left-semi against an aggregated key set; broadcast when the
    key set is small, shuffled-hash otherwise (AQE decides)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_urgent", F.lit(1))
    )
    return c.join(urgent, "c_custkey", "left").select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("has_urgent"), F.lit(0)).cast("int").alias("has_urgent"),
    )
