"""Queries over the custom Python data source and the Variant JSON
surface (Spark 4 features).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "custom_pysource_aggregate",
    oracle="""
    SELECT bucket, count(*)::BIGINT AS n, sum(score)::BIGINT AS total_score
    FROM (
      SELECT r AS rid, r % 97 AS bucket, (r * r) % 1000 AS score
      FROM (SELECT unnest(range(0, 8000)) AS r)
    )
    GROUP BY bucket
    """,
)
def custom_pysource_aggregate(spark, sf_dir):
    """Aggregate over the custom partition-parallel Python data source
    (8 partitions × 1000 deterministic rows) — proves the DataSource
    API path end-to-end; the oracle regenerates the same rows from a
    range."""
    from oracle_to_cassandra_spark.sources.pysource import register_synthetic_source

    try:
        register_synthetic_source(spark)
    except Exception:
        pass  # already registered in this session
    df = spark.read.format("synthetic_events").load()
    return df.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("score").alias("total_score")
    )


@query(
    "variant_json_extraction",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k')::INT AS k_val
    FROM events
    WHERE json_extract_string(props, '$.k')::INT BETWEEN 10 AND 20
    """,
)
def variant_json_extraction(spark, sf_dir):
    """VariantType path (Spark 4): parse_json → variant_get — the
    binary-encoded semi-structured column that replaces repeated string
    JSON parsing (parse once, extract many, with shredding-friendly
    storage)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.withColumn("props_v", F.parse_json("props"))
    return v.select(
        "event_id",
        F.expr("variant_get(props_v, '$.k', 'int')").alias("k_val"),
    ).filter(F.col("k_val").between(10, 20))
