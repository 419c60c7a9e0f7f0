"""Reference-native relational queries (SURVEY.md §2.1–2.3, §2.5).

Each query re-expresses one operator of the reference pipeline on the
driver's star schema, with the HR→testdata role mapping of FIXTURES.md
§B (EMPLOYEES→orders/lineitem, DEPARTMENTS→customer, the
COUNTRIES→REGIONS chain→nation→region).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators import relational as R
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "full_scan_region",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def full_scan_region(spark, sf_dir):
    """P1 (README.md:304): full-table select of the smallest dimension
    — the `select * from employees` analog."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "projection_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    """,
)
def projection_orders(spark, sf_dir):
    """P2/P3 (README.md:781,804): column-subset projection; Catalyst
    prunes the parquet ReadSchema to exactly these four columns."""
    return R.project(
        load_table(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )


@query(
    "rename_bulk_customer",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_nationkey AS nationkey,
           c_acctbal AS acctbal, c_mktsegment AS mktsegment
    FROM customer
    """,
)
def rename_bulk_customer(spark, sf_dir):
    """P4 (README.md:733-739): positional bulk rename via ``toDF`` —
    the lower-casing step the sink requires (README.md:705-709)."""
    return R.rename_all(
        load_table(spark, sf_dir, "customer"),
        ["custkey", "name", "nationkey", "acctbal", "mktsegment"],
    )


@query(
    "filter_eq_numeric",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem WHERE l_quantity = 30.0
    """,
)
def filter_eq_numeric(spark, sf_dir):
    """P5 (README.md:321,363): numeric equality predicate, pushed into
    the parquet scan (`where manager_id=121` analog)."""
    df = R.eq_filter(load_table(spark, sf_dir, "lineitem"), "l_quantity", 30.0)
    return df.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")


@query(
    "filter_eq_string",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def filter_eq_string(spark, sf_dir):
    """P6 (README.md:347,379): string equality predicate
    (`where job_id='ST_MAN'` analog)."""
    df = R.eq_filter(load_table(spark, sf_dir, "events"), "event_type", "purchase")
    return df.select("event_id", "user_id", "value")


@query(
    "point_lookup_customer",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment
    FROM customer WHERE c_custkey = 42
    """,
)
def point_lookup_customer(spark, sf_dir):
    """P7 (README.md:696-703): partition-key point lookup — the CQL
    `where employee_id=188` read; on the sink layout this prunes to a
    single partition directory."""
    df = R.point_lookup(load_table(spark, sf_dir, "customer"), "c_custkey", 42)
    return df.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")


@query(
    "denorm_orders_by_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           o.o_orderkey, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def denorm_orders_by_customer(spark, sf_dir):
    """J1 (README.md:931): THE reference join — fact⋈dimension inner
    equi-join producing the per-partition denormalized table
    (employees_by_dept → orders_by_customer).

    Scale: customer is broadcast (dimension side); the orders scan
    never shuffles — one pipelined stage at any SF where customer fits
    the broadcast threshold, AQE-planned shuffle join beyond it.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = R.inner_equi_join(
        orders, customer, orders.o_custkey == customer.c_custkey, broadcast_right=True
    )
    return joined.select(
        "c_custkey", "c_name", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@query(
    "self_join_adjacent_lines",
    oracle="""
    SELECT a.l_orderkey AS l_orderkey, a.l_linenumber AS line_a,
           b.l_linenumber AS line_b, a.l_partkey AS part_a,
           b.l_partkey AS part_b
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
    """,
)
def self_join_adjacent_lines(spark, sf_dir):
    """J2 (README.md:318-359,1029-1032): self equi-join — the
    employee→manager self-FK materialized (Query 4 exercise), expressed
    here as lineitem joined to its next line within the same order.

    Scale: both aliases shuffle on l_orderkey; the composite condition
    keeps the join 1:1 within an order. AQE splits skewed orders.
    """
    li = load_table(spark, sf_dir, "lineitem")
    joined = R.self_join(
        li,
        "a",
        "b",
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
    )
    return joined.select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("line_a"),
        F.col("b.l_linenumber").alias("line_b"),
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )


@query(
    "fk_chain_walk",
    oracle="""
    SELECT r.r_name, n.n_name, c.c_custkey, o.o_orderkey,
           l.l_linenumber, l.l_extendedprice
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    """,
)
def fk_chain_walk(spark, sf_dir):
    """J3 (README.md:317-394): the 6-hop FK walk — lineitem → orders →
    customer → nation → region, fully denormalized at row level.

    Scale: orders⋈lineitem is the only fact⋈fact hop (shuffles on
    l_orderkey); customer/nation/region are broadcast so the remaining
    hops stay in one pipelined stage. This is the flagship `entry()`
    query.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    walked = R.fk_chain_join(
        li,
        [
            (orders, li.l_orderkey == orders.o_orderkey, False),
            (customer, orders.o_custkey == customer.c_custkey, True),
            (nation, customer.c_nationkey == nation.n_nationkey, True),
            (region, nation.n_regionkey == region.r_regionkey, True),
        ],
    )
    return walked.select(
        "r_name", "n_name", "c_custkey", "o_orderkey", "l_linenumber", "l_extendedprice"
    )


@query(
    "distinct_departments",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_departments(spark, sf_dir):
    """A2 (README.md:988-1002): DISTINCT over a projection — the CQL
    `select distinct department_id, department_name` read.

    Scale: projection first, then distinct → the shuffle carries two
    small columns, not the whole row.
    """
    return R.distinct_projection(
        load_table(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"]
    )


@query(
    "static_column_per_partition",
    oracle="""
    SELECT c.c_nationkey AS c_nationkey,
           min(n.n_name) AS nation_name,
           count(*)::BIGINT AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_nationkey
    """,
)
def static_column_per_partition(spark, sf_dir):
    """A3 (README.md:903-913): static-column semantics — exactly one
    value per partition key. ``min`` (not ``first``) keeps the analog
    deterministic; functionally identical since the join key is the FK.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = R.inner_equi_join(
        customer, nation, customer.c_nationkey == nation.n_nationkey, broadcast_right=True
    )
    return joined.groupBy("c_nationkey").agg(
        F.min("n_name").alias("nation_name"),
        F.count("*").alias("n_customers"),
    )


@query(
    "global_counts",
    oracle="""
    SELECT count(*)::BIGINT AS n_lineitem,
           (SELECT count(*) FROM orders)::BIGINT AS n_orders
    FROM lineitem
    """,
)
def global_counts(spark, sf_dir):
    """A1 (README.md:596,876): global row counts — the reference's
    count-reconciliation check (107 employees / 27 departments)."""
    li = load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_lineitem"))
    orders = load_table(spark, sf_dir, "orders").agg(F.count("*").alias("n_orders"))
    return li.crossJoin(orders)


@query(
    "top_orders_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_orders_limit(spark, sf_dir):
    """L1 (README.md:498) generalized to a deterministic top-k: global
    order-by + limit with a unique tie-break.

    Scale: Spark plans this as TakeOrderedAndProject — per-partition
    top-k then a k-row merge on the driver; no global sort of 100 TB.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice")
        )
    )


@query(
    "clustering_order_scan",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
             ::BIGINT AS rn
    FROM orders
    """,
)
def clustering_order_scan(spark, sf_dir):
    """L2 (README.md:909,1005-1022): clustering-column order within a
    partition — rows of one partition key returned in clustering order,
    emulated with a window ordered by the clustering column.

    Scale: one shuffle on the partition key; within-partition sort is
    spillable. This is also exactly the layout ``sortWithinPartitions``
    bakes into the sink at write time.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey")
        .withColumn("rn", F.row_number().over(w).cast("long"))
    )
