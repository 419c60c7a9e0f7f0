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


@query(
    "analyze_table_cbo_stats",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           count(*)::BIGINT AS n_rows,
           (count(*) - count(o_custkey))::BIGINT AS n_nulls,
           min(o_custkey)::VARCHAR AS min_repr,
           max(o_custkey)::VARCHAR AS max_repr,
           TRUE AS ndv_within_tol
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*)::BIGINT,
           (count(*) - count(o_totalprice))::BIGINT,
           round(min(o_totalprice), 2)::VARCHAR,
           round(max(o_totalprice), 2)::VARCHAR,
           TRUE
    FROM orders
    """,
)
def analyze_table_cbo_stats(spark, sf_dir):
    """The COST-BASED-OPTIMIZER stats pipeline end to end: ``ANALYZE
    TABLE ... COMPUTE STATISTICS FOR COLUMNS`` populates the catalog
    with row counts, null counts, min/max, and an HLL distinct
    estimate — the numbers join reordering and broadcast decisions
    feed on — and this query READS THEM BACK from ``DESCRIBE
    EXTENDED`` and certifies each against the data: exact fields
    hash-compared, the sketch NDV pinned within the 6σ tolerance
    boolean (the stats_funcs HLL contract). A silently-stale or wrong
    catalog stat is the root cause of the worst 100 TB plans; this is
    the audit that catches it.

    Scale: ANALYZE is one scan with mergeable partial stats; the
    read-back is metadata-only."""
    import shutil

    from oracle_to_cassandra_spark import scratch

    tbl = scratch.session_table("cbo_stats_orders")
    loc = scratch.session_path(tbl)
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.option("path", loc).saveAsTable(tbl)
    spark.sql(
        f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS "
        "o_custkey, o_totalprice"
    )

    def col_stats(col):
        # DESCRIBE EXTENDED <col> returns ~10 fixed metadata rows from
        # the catalog (no table data, no scan) — the same bounded
        # driver-side metadata channel as a JDBC bounds fetch; this is
        # NOT a data collect
        rows = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE EXTENDED {tbl} {col}").collect()
        }
        return rows

    exact = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("o_custkey").alias("ndv_ck"),
            F.count_distinct("o_totalprice").alias("ndv_tp"),
        )
        .first()
    )

    out = []
    for col, ndv_exact, fmt in (
        ("o_custkey", exact["ndv_ck"], lambda v: v),
        ("o_totalprice", exact["ndv_tp"], lambda v: v),
    ):
        s = col_stats(col)
        ndv_stat = int(s["distinct_count"])
        tol = max(ndv_exact * 0.30, 10.0)  # 6 x rsd(0.05), floor 10
        # the catalog prints the LITERAL string 'NULL' for absent
        # min/max (empty table); the oracle's min()::VARCHAR is a real
        # NULL — normalize (both profiled columns are numeric, so the
        # string can never be a genuine value)
        out.append(
            (
                col,
                int(exact["n_rows"]),
                int(s["num_nulls"]),
                None if s["min"] == "NULL" else s["min"],
                None if s["max"] == "NULL" else s["max"],
                abs(ndv_stat - ndv_exact) <= tol,
            )
        )
    return spark.createDataFrame(
        out,
        "column_name string, n_rows long, n_nulls long, "
        "min_repr string, max_repr string, ndv_within_tol boolean",
    )
