"""Scale-technique operators as driver-checkable queries: the two
manual levers SURVEY.md §4 reserves for 100 TB — bucketed co-located
joins and salted skew aggregation — each proving its RESULT is
identical to the naive form (the technique changes the physical plan,
never the answer).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators.scale import write_bucketed_table
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "bucketed_join_orders_customers",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name,
           round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def bucketed_join_orders_customers(spark, sf_dir):
    """Co-located join via bucketing: both tables are persisted
    bucketed (hash-partitioned + sorted) on the join key, and the join
    plans as SortMergeJoin with ZERO Exchange on either side —
    Spark's analog of Cassandra token-range co-location
    (`/root/reference/README.md:668` keyspace locality). At 100 TB
    this converts the nightly fact⋈dim shuffle into a local merge per
    bucket; the write-side bucketing cost is paid once, not per query.

    The oracle is the plain join — bucketing must not change the
    answer, only the plan (asserted in tests/test_plan_shape.py)."""
    import shutil

    n_buckets = 8
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # explicit external paths + pre-wipe: idempotent across sessions
    # (the in-memory catalog forgets tables at JVM exit but the
    # directories survive)
    for tbl in ("orders_bkt", "customer_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"/root/repo/.scratch/{tbl}", ignore_errors=True)
    write_bucketed_table(
        orders.withColumnRenamed("o_custkey", "bkey"),
        "orders_bkt",
        "bkey",
        n_buckets,
        path="/root/repo/.scratch/orders_bkt",
    )
    write_bucketed_table(
        cust.withColumnRenamed("c_custkey", "bkey"),
        "customer_bkt",
        "bkey",
        n_buckets,
        path="/root/repo/.scratch/customer_bkt",
    )
    joined = spark.table("orders_bkt").join(spark.table("customer_bkt"), "bkey")
    return joined.select(
        "o_orderkey",
        F.col("bkey").alias("o_custkey"),
        "c_name",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@query(
    "salted_skew_aggregate",
    oracle="""
    SELECT o_orderstatus,
           count(*)::BIGINT           AS n_orders,
           round(sum(o_totalprice), 0) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def salted_skew_aggregate(spark, sf_dir):
    """Skewed-key aggregation by salting: o_orderstatus has 3 values
    ('O' and 'F' each hold ~half the table — a textbook hot key), so a
    direct groupBy sends half the rows to one reducer. Two-stage form:
    stage 1 groups on (key, salt) — 16-way spread of each hot key,
    map-side combine still applies — stage 2 re-aggregates the 3×16
    partials. Counts and sums re-aggregate losslessly, so the result
    is bit-identical to the direct groupBy (the oracle).

    AQE cannot split a skewed AGGREGATION (only skewed join sides);
    explicit salting is the remaining lever at 100 TB. The salt is
    derived from o_orderkey, not random — reruns are deterministic."""
    o = load_table(spark, sf_dir, "orders")
    n_salt = 16
    stage1 = (
        o.withColumn("_salt", F.pmod(F.col("o_orderkey"), F.lit(n_salt)))
        .groupBy("o_orderstatus", "_salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum("o_totalprice").alias("ps"),
        )
    )
    return stage1.groupBy("o_orderstatus").agg(
        F.sum("pn").alias("n_orders"),
        F.round(F.sum("ps"), 0).alias("total_price"),
    )
