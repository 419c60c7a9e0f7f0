"""Pandas-UDF queries — Python stages with exact SQL twins, so the
Arrow path itself is under the driver's hash check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators.udfs import log_price_score, zscore_per_group
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "pandas_udf_scalar_score",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(ln(l_extendedprice + 1) * sqrt(l_quantity), 6) AS score
    FROM lineitem
    """,
)
def pandas_udf_scalar_score(spark, sf_dir):
    """Scalar pandas UDF (Arrow-vectorized numpy) vs the same formula
    in SQL — verifies the Python batch path bit-for-bit (both sides
    compute in IEEE double; round 6)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(log_price_score(F.col("l_extendedprice"), F.col("l_quantity")), 6).alias(
            "score"
        ),
    )


@query(
    "grouped_map_zscore",
    oracle="""
    SELECT c_mktsegment, c_acctbal,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 6)
             AS zscore
    FROM customer
    """,
)
def grouped_map_zscore(spark, sf_dir):
    """applyInPandas grouped-map z-score vs the window-function twin —
    the custom-per-group-algorithm template under an exact check."""
    return zscore_per_group(
        load_table(spark, sf_dir, "customer"), "c_mktsegment", "c_acctbal"
    )
