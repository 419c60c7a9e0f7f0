"""Pure-SQL surface: the same engine driven entirely through
``spark.sql`` text (CTEs, GROUP BY ALL) — parity evidence that the SQL
entry point (the reference's ``sqlContext.sql``, README.md:781,931)
exposes the full operator set, and null-imputation (na.fill/na.drop).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table, register_views

_CTE_SQL = """
WITH seg_orders AS (
  SELECT c.c_mktsegment, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
seg_stats AS (
  SELECT c_mktsegment,
         count(*) AS n_orders,
         round(avg(o_totalprice), 6) AS avg_price
  FROM seg_orders GROUP BY c_mktsegment
)
SELECT * FROM seg_stats WHERE n_orders > 50
"""


@query(
    "cte_sql_text_pipeline",
    oracle="""
    WITH seg_orders AS (
      SELECT c.c_mktsegment, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    seg_stats AS (
      SELECT c_mktsegment,
             count(*)::BIGINT AS n_orders,
             round(avg(o_totalprice), 6) AS avg_price
      FROM seg_orders GROUP BY c_mktsegment
    )
    SELECT * FROM seg_stats WHERE n_orders > 50
    """,
)
def cte_sql_text_pipeline(spark, sf_dir):
    """Multi-CTE pipeline expressed as ONE SQL string through
    ``spark.sql`` — the text entry point produces the same Catalyst
    plan as the DataFrame API (E2 lifecycle, SURVEY.md §3)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_CTE_SQL)


@query(
    "na_fill_drop_imputation",
    oracle="""
    SELECT c_custkey,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END,
                    0.0) AS bal_filled,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL)::INT
             AS was_imputed
    FROM customer
    """,
)
def na_fill_drop_imputation(spark, sf_dir):
    """Null imputation via ``df.na.fill``: negative balances nulled
    (data-quality rule), then filled with a default, flagged — the
    DataFrameNaFunctions surface under an exact oracle."""
    c = load_table(spark, sf_dir, "customer")
    nulled = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.round("c_acctbal", 2))
        .alias("bal_filled"),
    ).withColumn("was_imputed", F.col("bal_filled").isNull().cast("int"))
    return nulled.na.fill({"bal_filled": 0.0})
