"""Denormalization pipelines (Query 1–4 of the reference) as checkable
queries, plus the sink round-trip (S8/S9/S10 + P7).
"""

from __future__ import annotations

from oracle_to_cassandra_spark import pipelines as P
from oracle_to_cassandra_spark import scratch
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sinks import read_partition, write_query_table


@query(
    "pipeline_lineitems_by_part",
    oracle="""
    SELECT p.p_partkey, p.p_name, p.p_brand,
           l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def pipeline_lineitems_by_part(spark, sf_dir):
    """Query 3 analog (README.md:1024-1027): employees_by_job →
    lineitems_by_part denormalization."""
    return P.build_lineitems_by_part(spark, sf_dir)


@query(
    "pipeline_lineitems_by_supplier",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name,
           l.l_orderkey, l.l_linenumber,
           round(l.l_extendedprice, 2) AS l_extendedprice
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    """,
)
def pipeline_lineitems_by_supplier(spark, sf_dir):
    """Query 4 analog (README.md:1029-1032): the manager-chain
    denormalization — fact through two broadcast dimension hops."""
    return P.build_lineitems_by_supplier(spark, sf_dir)


@query(
    "sink_roundtrip_partition_lookup",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderstatus,
           round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def sink_roundtrip_partition_lookup(spark, sf_dir):
    """S8→S9→P7 end-to-end (README.md:839-889,696-703): build the
    denormalized table, write it partitioned by the partition key,
    read back ONE partition via a pruned point lookup — the full
    write-then-verify loop of the reference.

    Scale: the read-back predicate prunes partition directories at
    planning time; only the matching segment's files are scanned.
    """
    path = scratch.session_path("orders_by_customer")
    df = P.denorm_orders_by_customer(spark, sf_dir)
    write_query_table(
        df, path, partition_by=["c_mktsegment"], cluster_by=["c_custkey", "o_orderkey"]
    )
    return read_partition(spark, path, "c_mktsegment", "BUILDING").select(
        "c_custkey", "c_name", "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "sink_ddl_roundtrip",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def sink_ddl_roundtrip(spark, sf_dir):
    """S10 (README.md:668,683-694,902-909): the reference treats DDL as
    first-class — CREATE TABLE … PARTITIONED BY through SQL, insert,
    then a partition-pruned read back through the catalog table.

    Scale: the WHERE on the partition column prunes to one partition
    directory at planning time (metadata-only, no data scan of the
    other status partitions)."""
    import shutil

    from oracle_to_cassandra_spark.sources import load_table

    # session-token name + LOCATION: idempotent within the session
    # (DROP+rmtree re-create) and collision-free across concurrent
    # sessions sharing the metastore or the scratch tree
    tbl = scratch.session_table("ddl_orders_roundtrip")
    loc = scratch.session_path(tbl)
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"""
        CREATE TABLE {tbl} (
          o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING
        ) USING parquet PARTITIONED BY (o_orderstatus)
        LOCATION '{loc}'
        """
    )
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).write.mode("append").insertInto(tbl)
    return spark.sql(
        f"""
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
        FROM {tbl} WHERE o_orderstatus = 'F'
        """
    )
