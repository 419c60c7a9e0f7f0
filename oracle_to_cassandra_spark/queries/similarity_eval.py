"""Self-evaluating similarity/dedup variants: IVF recall@k against the
brute-force baseline, and winnowed (down-sampled) MinHash — each the
documented cost/quality trade-off lever for the 100 TB path, with the
quality loss MEASURED in-engine rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.functions.hashing import MERSENNE_P, MINHASH_A, MINHASH_B
from oracle_to_cassandra_spark.functions.vector import cosine
from oracle_to_cassandra_spark.operators.dedup import doc_shingle_hashes, doc_shingle_hashes_sql
from oracle_to_cassandra_spark.operators.similarity import label_centroids
from oracle_to_cassandra_spark.queries.similarity import (
    PROBE_IDS,
    bruteforce_topk_sql,
    ivf_topk_sql,
)
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

# The oracle composes the SQL of the two ANN twins via their exported
# helper functions (NOT by reading the registry — module-order
# independent, duplicate-guard preserved).
_RECALL_SQL = f"""
WITH bf AS ({bruteforce_topk_sql()}),
ivf AS ({ivf_topk_sql()}),
inter AS (
  SELECT bf.probe_id, count(*)::BIGINT AS n_overlap
  FROM bf JOIN ivf ON bf.probe_id = ivf.probe_id
                  AND bf.neighbor_id = ivf.neighbor_id
  GROUP BY bf.probe_id
)
SELECT p.probe_id, round(coalesce(i.n_overlap, 0) / 10.0, 2) AS recall_at_10
FROM (SELECT DISTINCT probe_id FROM bf) p
LEFT JOIN inter i ON i.probe_id = p.probe_id
"""


@query("similarity_ivf_recall_at_10", oracle=_RECALL_SQL)
def similarity_ivf_recall_at_10(spark, sf_dir):
    """Recall@10 of IVF vs exact brute force per probe: |IVF∩BF|/10 —
    the quality audit every approximate index needs. At 100 TB this
    runs on a sampled probe set as a continuous data-quality job.

    FUSED plan: the corpus is cosine-scored against the probes ONCE
    (broadcast join, no exchange); a single window over probe_id then
    yields BOTH ranks — ``row_number`` is the brute-force rank, and a
    running ``sum(in_cell)`` over the same sort is the rank *within
    the probe's IVF cell* (identical ordering, so it equals the IVF
    variant's rank). One corpus-sized exchange total, vs the previous
    two independent scoring pipelines (9 exchanges)."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    cents = label_centroids(e)
    assigned = probes.crossJoin(F.broadcast(cents)).withColumn(
        "c_sim", cosine(F.col("p_emb"), F.col("centroid"))
    )
    wc = Window.partitionBy("probe_id").orderBy(F.desc("c_sim"), F.asc("label"))
    best_cell = (
        assigned.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") == 1)
        .select("probe_id", F.col("label").alias("cell"))
    )
    cands = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
    )
    scored = (
        F.broadcast(probes.join(best_cell, "probe_id"))
        .join(cands, F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("p_emb"), F.col("c_emb")), 6))
        .withColumn("in_cell", (F.col("c_label") == F.col("cell")).cast("int"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = scored.select(
        "probe_id",
        "in_cell",
        F.row_number().over(w).alias("bf_rn"),
        F.sum("in_cell").over(wf).alias("ivf_rn"),
    )
    overlap = (
        ranked.filter(
            (F.col("bf_rn") <= 10) & (F.col("in_cell") == 1) & (F.col("ivf_rn") <= 10)
        )
        .groupBy("probe_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        # probe list from the cheap filter scan, NOT best_cell — that
        # would re-execute the whole centroid pipeline a second time
        probes.select("probe_id")
        .join(overlap, "probe_id", "left")
        .select(
            "probe_id",
            F.round(F.coalesce(F.col("n_overlap"), F.lit(0)) / 10.0, 2).alias(
                "recall_at_10"
            ),
        )
    )


@query(
    "embedding_dimension_stats",
    oracle="""
    SELECT pos, round(avg(v), 6) AS mean_v,
           round(stddev_samp(v), 6) AS sd_v,
           round(min(v), 6) AS min_v, round(max(v), 6) AS max_v
    FROM (
      SELECT unnest(embedding::DOUBLE[]) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    GROUP BY pos
    """,
)
def embedding_dimension_stats(spark, sf_dir):
    """Per-dimension corpus statistics (mean/sd/min/max of each of the
    64 components) via posexplode — the normalization/whitening audit
    run before building a similarity index. Shuffle carries one partial
    row per (partition × 64 dims)."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(F.posexplode("embedding").alias("pos0", "v")).select(
        (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").alias("v")
    )
    return exploded.groupBy("pos").agg(
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.stddev_samp("v"), 6).alias("sd_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )


@query(
    "dedup_minhash_winnowed",
    oracle=f"""
    WITH sh_tbl AS ({doc_shingle_hashes_sql()}),
    kept AS (SELECT doc_id, h31 FROM sh_tbl WHERE h31 % 4 = 0)
    SELECT doc_id,
           min((h31 * {MINHASH_A[0]} + {MINHASH_B[0]}) % {MERSENNE_P}) AS sig0,
           min((h31 * {MINHASH_A[1]} + {MINHASH_B[1]}) % {MERSENNE_P}) AS sig1,
           count(*)::BIGINT AS n_kept_shingles
    FROM kept GROUP BY doc_id
    """,
)
def dedup_minhash_winnowed(spark, sf_dir):
    """Winnowed MinHash: keep only shingles with h ≡ 0 (mod 4) — a 4×
    shingle-stream reduction before signature aggregation (the MOSS-
    style down-sampling lever for 100 TB corpora). Hash-based
    selection keeps the sample content-deterministic, so identical
    docs still produce identical signatures."""
    sh = doc_shingle_hashes(load_table(spark, sf_dir, "documents"))
    kept = sh.filter(F.col("h31") % 4 == 0)
    return kept.groupBy("doc_id").agg(
        F.min((F.col("h31") * MINHASH_A[0] + MINHASH_B[0]) % MERSENNE_P).alias("sig0"),
        F.min((F.col("h31") * MINHASH_A[1] + MINHASH_B[1]) % MERSENNE_P).alias("sig1"),
        F.count("*").alias("n_kept_shingles"),
    )
