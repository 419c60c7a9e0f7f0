"""The reference's denormalization pipelines as composed operators.

The engineering substance of the reference (SURVEY.md §2.7) is the
pattern: *query-driven denormalization of a normalized schema via
Spark joins, written to per-query partition-oriented tables*
(`/root/reference/README.md:892-1022`). These pipelines reproduce the
four tutorial queries on the star schema:

  Query 1 — point lookup table  → ``build_orders_table``
  Query 2 — employees_by_dept   → ``build_orders_by_customer``
  Query 3 — employees_by_job    → ``build_lineitems_by_part``
  Query 4 — employees_by_manager→ ``build_lineitems_by_supplier``

Each: read → rename/project → join (J1) → validate lower-case columns
→ write partitioned+clustered sink (S8/S10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators import relational as R
from oracle_to_cassandra_spark.sinks import write_query_table
from oracle_to_cassandra_spark.sources import load_table


def denorm_orders_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-2 build join (README.md:931 analog): orders ⋈ customer,
    customer attributes denormalized onto every order row — the static
    column (c_name per partition) carried by the join itself."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return R.inner_equi_join(
        orders, customer, orders.o_custkey == customer.c_custkey, broadcast_right=True
    ).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def build_orders_table(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Query 1 (README.md:683-694): the point-lookup table keyed by the
    row id — PRIMARY KEY (o_orderkey) analog. FK columns dropped, as
    the reference drops JOB_ID/MANAGER_ID/DEPARTMENT_ID
    (README.md:653)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    # single-column PK → partition by a bucket of the key, not the raw
    # key (100 TB note: one directory per orderkey would be billions of
    # dirs; Cassandra hashes the PK into token ranges — the bucket is
    # the same idea)
    bucketed = orders.withColumn("pk_bucket", F.pmod(F.col("o_orderkey"), F.lit(64)))
    write_query_table(bucketed, path, partition_by=["pk_bucket"], cluster_by=["o_orderkey"])


def build_orders_by_customer(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Query 2 (README.md:903-967): composite PK (partition key
    c_custkey, clustering o_orderkey), static column c_name."""
    df = denorm_orders_by_customer(spark, sf_dir)
    write_query_table(df, path, partition_by=["c_mktsegment"], cluster_by=["c_custkey", "o_orderkey"])


def build_lineitems_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query 3 exercise (README.md:1024-1027): employees_by_job →
    lineitems grouped under their part ("job")."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return R.inner_equi_join(
        li, part, li.l_partkey == part.p_partkey, broadcast_right=True
    ).select("p_partkey", "p_name", "p_brand", "l_orderkey", "l_linenumber", "l_quantity")


def build_lineitems_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query 4 exercise (README.md:1029-1032): employees_by_manager →
    the self-FK denormalization, here lineitems under their supplier
    with the supplier's nation walked in (manager → employee chain)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        R.fk_chain_join(
            li,
            [
                (supplier, li.l_suppkey == supplier.s_suppkey, True),
                (nation, supplier.s_nationkey == nation.n_nationkey, True),
            ],
        )
        .select("s_suppkey", "s_name", "n_name", "l_orderkey", "l_linenumber",
                F.round("l_extendedprice", 2).alias("l_extendedprice"))
    )
