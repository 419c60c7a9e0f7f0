"""Catalog/metadata queries (S4/S5 of SURVEY.md §2.1): table listing
and schema introspection — `select table_name from user_tables`
(README.md:210) and `desc <table>` (README.md:231...) analogs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import TABLES, load_table, register_views


@query(
    "catalog_list_tables",
    oracle="SELECT unnest(['customer','lineitem','nation','orders','region']) AS table_name",
)
def catalog_list_tables(spark, sf_dir):
    """S4 (README.md:210): list registered tables — filtered to the
    star-schema core so the result is stable regardless of what else
    the session has registered."""
    register_views(spark, sf_dir, ("region", "nation", "customer", "orders", "lineitem"))
    listed = [t.name for t in spark.catalog.listTables()]
    wanted = sorted(set(listed) & {"customer", "lineitem", "nation", "orders", "region"})
    return spark.createDataFrame([(t,) for t in wanted], "table_name string")


@query(
    "catalog_describe_customer",
    oracle="""
    SELECT column_name, data_type FROM (
      VALUES ('c_custkey', 'bigint'), ('c_name', 'string'),
             ('c_nationkey', 'int'), ('c_acctbal', 'double'),
             ('c_mktsegment', 'string')
    ) t(column_name, data_type)
    """,
)
def catalog_describe_customer(spark, sf_dir):
    """S5 (README.md:231-298): `desc <table>` — schema introspection
    from the DataFrame schema (inferred from parquet metadata exactly
    as the reference infers from JDBC metadata, README.md:471)."""
    df = load_table(spark, sf_dir, "customer")
    rows = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    return spark.createDataFrame(rows, "column_name string, data_type string")
