"""End-to-end tests for the reference's Query 1/2 build pipelines
(README.md:683-694, 892-967): build → write partitioned+clustered →
read back by partition key."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oracle_to_cassandra_spark import pipelines as P
from oracle_to_cassandra_spark.sinks import read_partition
from oracle_to_cassandra_spark.sources import load_table
from tests.conftest import SF_DIR

SCRATCH = "/root/repo/.scratch/tests"


def test_build_orders_table_point_lookup(spark):
    """Query 1 analog: single-PK table, bucketed partitioning, point
    lookup returns exactly the one row."""
    path = os.path.join(SCRATCH, "orders_q1")
    P.build_orders_table(spark, SF_DIR, path)
    out = spark.read.parquet(path)
    # pk bucket pruning + key filter = the CQL point lookup
    row = out.filter(F.col("o_orderkey") == 7).collect()
    assert len(row) == 1
    # FK columns are dropped, as the reference drops them (README.md:653)
    assert "o_custkey" not in out.columns


def test_build_orders_by_customer_clustering(spark):
    """Query 2 analog: composite partition+clustering layout; rows
    within a partition file come back in clustering order."""
    path = os.path.join(SCRATCH, "orders_q2")
    P.build_orders_by_customer(spark, SF_DIR, path)
    seg = read_partition(spark, path, "c_mktsegment", "BUILDING")
    n_direct = (
        P.denorm_orders_by_customer(spark, SF_DIR)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .count()
    )
    assert seg.count() == n_direct
    # static-column semantics: exactly one c_name per c_custkey
    dup_names = (
        seg.groupBy("c_custkey")
        .agg(F.count_distinct("c_name").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup_names == 0


def test_sql_ddl_partitioned_table(spark):
    """S10 analog (README.md:668,683-694): CREATE TABLE ... USING
    parquet PARTITIONED BY through SQL DDL, insert, partition-pruned
    read."""
    spark.sql("DROP TABLE IF EXISTS ddl_orders")
    spark.sql(
        """
        CREATE TABLE ddl_orders (
          o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING
        ) USING parquet PARTITIONED BY (o_orderstatus)
        """
    )
    try:
        load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        ).write.mode("append").insertInto("ddl_orders")
        got = spark.sql(
            "SELECT count(*) AS n FROM ddl_orders WHERE o_orderstatus = 'F'"
        ).collect()[0].n
        want = (
            load_table(spark, SF_DIR, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .count()
        )
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_orders")
