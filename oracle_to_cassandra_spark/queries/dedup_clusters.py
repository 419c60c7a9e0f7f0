"""Near-dup clustering + merge (SCD-style) — the closing stages of the
dedup pipeline: pairs → connected components → keeper per cluster, and
the MERGE-INTO emulation for applying curated updates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators.dedup import jaccard_verified_pairs_sql
from oracle_to_cassandra_spark.operators.graph import connected_components
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "dedup_cluster_assignment",
    oracle=f"""
    WITH RECURSIVE pairs AS ({jaccard_verified_pairs_sql(threshold=0.6)}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, least(u, min(v)) AS cluster_id
    FROM reach GROUP BY u
    """,
)
def dedup_cluster_assignment(spark, sf_dir):
    """Connected components over verified near-dup pairs: every
    clustered doc labeled with min doc_id of its cluster — the
    iterative-algorithm surface (driver-loop min-label propagation;
    the oracle states the same fixpoint as a recursive CTE)."""
    from oracle_to_cassandra_spark.operators.dedup import jaccard_verified_pairs

    pairs = jaccard_verified_pairs(load_table(spark, sf_dir, "documents"), 0.6)
    return connected_components(pairs)


@query(
    "dedup_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE pairs AS ({jaccard_verified_pairs_sql(threshold=0.6)}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    sizes AS (
      SELECT cluster_id, count(*)::BIGINT AS cluster_size
      FROM labels GROUP BY cluster_id
    )
    SELECT cluster_size, count(*)::BIGINT AS n_clusters
    FROM sizes GROUP BY cluster_size
    """,
)
def dedup_cluster_size_histogram(spark, sf_dir):
    """Cluster-size histogram — the summary every dedup pipeline
    reports (how many pairs/triples/mega-clusters): CC labels →
    per-cluster size → size frequency. A mega-cluster spike is the
    canonical signal of an over-permissive LSH threshold; at 100 TB
    this histogram is the cheap audit run before committing a
    keeper-selection pass. Two tiny aggregates on top of the CC
    output (cluster-count-sized, not corpus-sized)."""
    from oracle_to_cassandra_spark.operators.dedup import jaccard_verified_pairs

    pairs = jaccard_verified_pairs(load_table(spark, sf_dir, "documents"), 0.6)
    labels = connected_components(pairs)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count("*").alias("n_clusters"))


@query(
    "merge_scd_status_update",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 100 = 0 THEN 'U' ELSE o_orderstatus END
             AS o_orderstatus,
           (o_orderkey % 100 = 0)::INT AS was_updated
    FROM orders
    """,
)
def merge_scd_status_update(spark, sf_dir):
    """MERGE INTO emulation (no Delta in this build): apply an updates
    batch to a target via anti-join (untouched rows) ∪ updated rows —
    the CDC/SCD upsert mechanics on plain parquet tables. The updates
    batch is deterministically derived (keys ≡ 0 mod 100) so the
    oracle can state the post-merge table directly."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    updates = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey")
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("was_updated", F.lit(1))
    )
    untouched = (
        orders.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
        .withColumn("was_updated", F.lit(0))
    )
    return untouched.unionByName(updates)
