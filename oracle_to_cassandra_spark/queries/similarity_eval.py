"""Self-evaluating similarity/dedup variants: IVF recall@k against the
brute-force baseline, and winnowed (down-sampled) MinHash — each the
documented cost/quality trade-off lever for the 100 TB path, with the
quality loss MEASURED in-engine rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.functions.hashing import MERSENNE_P, MINHASH_A, MINHASH_B
from oracle_to_cassandra_spark.operators.dedup import doc_shingle_hashes, doc_shingle_hashes_sql
from oracle_to_cassandra_spark.operators.similarity import brute_force_topk, ivf_topk
from oracle_to_cassandra_spark.queries.similarity import PROBE_IDS, _PROBES_SQL
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

# reuse the exact SQL of the two ANN variants from their query twins
from oracle_to_cassandra_spark.registry import ORACLE as _ORACLE


@query(
    "similarity_ivf_recall_at_10",
    oracle=None,  # set below once the ANN twins are registered
)
def similarity_ivf_recall_at_10(spark, sf_dir):
    """Recall@10 of IVF vs exact brute force per probe: |IVF∩BF|/10 —
    the quality audit every approximate index needs. At 100 TB this
    runs on a sampled probe set as a continuous data-quality job."""
    e = load_table(spark, sf_dir, "embeddings")
    bf = brute_force_topk(e, PROBE_IDS, k=10).select(
        "probe_id", F.col("neighbor_id").alias("bf_neighbor")
    )
    ivf = ivf_topk(e, PROBE_IDS, k=10).select(
        "probe_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    inter = bf.join(
        ivf,
        (bf.probe_id == ivf.probe_id) & (bf.bf_neighbor == ivf.ivf_neighbor),
    ).groupBy(bf.probe_id.alias("probe_id")).agg(F.count("*").alias("n_overlap"))
    return (
        bf.select("probe_id")
        .distinct()
        .join(inter, "probe_id", "left")
        .select(
            "probe_id",
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / 10.0, 2
            ).alias("recall_at_10"),
        )
    )


# the oracle is the same recall computation over the two ANN oracle
# texts already registered by queries/similarity.py
_ORACLE["similarity_ivf_recall_at_10"] = f"""
WITH bf AS ({_ORACLE["similarity_bruteforce_topk"]}),
ivf AS ({_ORACLE["similarity_ivf_topk"]}),
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
