"""Near-dup clustering + merge (SCD-style) — the closing stages of the
dedup pipeline: pairs → connected components → keeper per cluster, and
the MERGE-INTO emulation for applying curated updates.
"""

from __future__ import annotations

from pyspark.sql import Window
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


def _keep_best_oracle() -> str:
    from oracle_to_cassandra_spark.queries.text_analysis import QUALITY_SQL

    return f"""
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
    scored AS (
      SELECT d.doc_id,
             coalesce(l.cluster_id, d.doc_id) AS cluster_id,
             {QUALITY_SQL} AS quality
      FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT cluster_id, doc_id, quality,
             row_number() OVER (
               PARTITION BY cluster_id ORDER BY quality DESC, doc_id
             ) AS rn,
             count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM scored
    )
    SELECT cluster_id, doc_id AS keeper_doc_id,
           round(quality, 6) AS keeper_quality,
           cluster_size::BIGINT AS cluster_size
    FROM ranked WHERE rn = 1 AND cluster_size > 1
    """


@query("dedup_keep_best_quality", oracle=_keep_best_oracle())
def dedup_keep_best_quality(spark, sf_dir):
    """Quality-aware cluster representative selection: per near-dup
    cluster, KEEP the member with the highest quality score (min
    doc_id only as the tie-break) — what a production dedup pass
    actually does, vs the min-id convention of
    ``dedup_cluster_assignment``. Singleton docs are trivially their
    own keeper and are filtered out; the output is the action list
    (one row per real cluster: who survives, how good, how many
    collapsed).

    Scale: cluster labels are node-sized (CC over LSH-verified pairs,
    never all-pairs); scoring is one codegen'd pass over documents;
    the rank window partitions by cluster_id — cluster-sized
    partitions, bounded by the LSH threshold, never a global sort."""
    from oracle_to_cassandra_spark.operators import text as TX
    from oracle_to_cassandra_spark.operators.dedup import jaccard_verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    labels = connected_components(jaccard_verified_pairs(docs, 0.6))
    scored = (
        docs.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            F.expr(TX.quality_score_sx("text")).alias("quality"),
        )
    )
    w = Window.partitionBy("cluster_id")
    ranked = scored.select(
        "cluster_id",
        "doc_id",
        "quality",
        F.row_number()
        .over(w.orderBy(F.desc("quality"), F.asc("doc_id")))
        .alias("rn"),
        F.count("*").over(w).alias("cluster_size"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("cluster_size") > 1)).select(
        "cluster_id",
        F.col("doc_id").alias("keeper_doc_id"),
        F.round("quality", 6).alias("keeper_quality"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


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
