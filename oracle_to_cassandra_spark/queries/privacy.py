"""Privacy-risk audits over structured tables.

The reference migrates customer PII verbatim
(`/root/reference/README.md:676-703` moves name/segment/balance as-is);
a training-data pipeline must quantify re-identification risk BEFORE
such a table feeds a corpus. k-anonymity is the standard lens: a row
is k-anonymous iff at least k rows share its full quasi-identifier
combination — small equivalence classes are linkable.

Scale: one grouped aggregate over the quasi-identifier tuple, then a
group-size re-aggregate — both map-side combinable; no row leaves the
cluster, only class-size histograms.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

#: acctbal is bucketed to a coarse band — the generalization step any
#: k-anonymity assessment applies to continuous quasi-identifiers
_BAL_BAND = 1000


@query(
    "kanonymity_quasi_identifier_audit",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / {_BAL_BAND}) AS BIGINT) AS bal_band,
             count(*)::BIGINT AS class_size
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT CASE WHEN class_size = 1 THEN 'k=1 (unique)'
                WHEN class_size < 5 THEN 'k in [2,5)'
                WHEN class_size < 20 THEN 'k in [5,20)'
                ELSE 'k >= 20' END AS k_band,
           count(*)::BIGINT AS n_classes,
           sum(class_size)::BIGINT AS n_rows,
           min(class_size)::BIGINT AS min_k,
           max(class_size)::BIGINT AS max_k
    FROM classes GROUP BY 1
    """,
)
def kanonymity_quasi_identifier_audit(spark, sf_dir):
    """k-anonymity audit of the customer table under the
    quasi-identifier (nation, market segment, balance band): how many
    equivalence classes and rows sit in each k-band. 'k=1 (unique)'
    rows are individually re-identifiable by the combination alone —
    the number that decides whether this table may join a corpus
    un-generalized.

    Scale: two map-side-combinable aggregates; the histogram is
    k-band-sized. The same plan at 100 TB emits four rows."""
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / _BAL_BAND).cast("long").alias("bal_band"),
    ).agg(F.count("*").alias("class_size"))
    k_band = (
        F.when(F.col("class_size") == 1, "k=1 (unique)")
        .when(F.col("class_size") < 5, "k in [2,5)")
        .when(F.col("class_size") < 20, "k in [5,20)")
        .otherwise("k >= 20")
    )
    return classes.groupBy(k_band.alias("k_band")).agg(
        F.count("*").alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        F.min("class_size").alias("min_k"),
        F.max("class_size").alias("max_k"),
    )


@query(
    "ldiversity_sensitive_attribute_audit",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / {_BAL_BAND}) AS BIGINT) AS bal_band,
             count(*)::BIGINT AS class_size,
             count(DISTINCT c_mktsegment)::BIGINT AS l_distinct
      FROM customer
      GROUP BY 1, 2
    )
    SELECT l_distinct,
           count(*)::BIGINT AS n_classes,
           sum(class_size)::BIGINT AS n_rows
    FROM classes GROUP BY 1
    """,
)
def ldiversity_sensitive_attribute_audit(spark, sf_dir):
    """l-diversity companion to the k-anonymity audit: treating
    c_mktsegment as the SENSITIVE attribute and (nation, balance band)
    as the quasi-identifier, count equivalence classes by how many
    distinct sensitive values they contain. Classes with l = 1 leak
    the sensitive attribute even when k is large — k-anonymity alone
    misses this (the homogeneity attack).

    Scale: grouped single-distinct aggregate (two-stage partial dedup,
    no Expand) + a class-size re-aggregate."""
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / _BAL_BAND).cast("long").alias("bal_band"),
    ).agg(
        F.count("*").alias("class_size"),
        F.count_distinct("c_mktsegment").alias("l_distinct"),
    )
    return classes.groupBy("l_distinct").agg(
        F.count("*").alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
    )
