"""Similarity-search queries: exact brute-force cosine top-k (the
baseline) and the IVF-style cell-pruned variant (the scale path), plus
an LSH-bucket grouping via SimHash-style hyperplane signs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators import similarity as S
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

PROBE_IDS = [0, 100, 200, 300, 400]
#: derived, not restated: the Spark filters and the oracle texts must
#: draw the probe set from the same list
_PROBES_SQL = "(" + ", ".join(str(p) for p in PROBE_IDS) + ")"


def bruteforce_topk_sql() -> str:
    """DuckDB oracle text for the brute-force top-k — exposed as a
    helper so composite queries (similarity_eval) can embed it without
    reaching into the registry (module-order independent)."""
    return _BRUTEFORCE_SQL


def ivf_topk_sql() -> str:
    """DuckDB oracle text for the IVF top-k (see bruteforce_topk_sql)."""
    return _IVF_SQL


_BRUTEFORCE_SQL = f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS p
      FROM embeddings WHERE vec_id IN {_PROBES_SQL}
    ),
    scored AS (
      SELECT probes.probe_id, e.vec_id AS neighbor_id,
             round(list_dot_product(p, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(p, p))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))), 6) AS cos_sim
      FROM probes JOIN embeddings e ON probes.probe_id <> e.vec_id
    )
    SELECT probe_id, neighbor_id, cos_sim, rn FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rn
      FROM scored
    ) WHERE rn <= 10
    """


@query("similarity_bruteforce_topk", oracle=_BRUTEFORCE_SQL)
def similarity_bruteforce_topk(spark, sf_dir):
    """Exact ANN baseline: top-10 cosine neighbors for 5 fixed probes
    against the whole corpus. Probes broadcast; corpus side stays
    distributed; per-probe top-k via WindowGroupLimit."""
    return S.brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), PROBE_IDS, k=10
    )


_IVF_SQL = f"""
    WITH cents AS (
      SELECT label, list(c ORDER BY pos) AS centroid FROM (
        SELECT label, pos, (sum(CAST(round(v * 1000000) AS BIGINT))::BIGINT / 1000000.0)
           / count(v) AS c FROM (
          SELECT label, unnest(embedding::DOUBLE[]) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings
        ) GROUP BY label, pos
      ) GROUP BY label
    ),
    probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS p
      FROM embeddings WHERE vec_id IN {_PROBES_SQL}
    ),
    assigned AS (
      SELECT probe_id, p, label AS cell FROM (
        SELECT probes.probe_id, probes.p, cents.label,
               row_number() OVER (
                 PARTITION BY probes.probe_id
                 ORDER BY list_dot_product(p, centroid)
                          / (sqrt(list_dot_product(p, p))
                             * sqrt(list_dot_product(centroid, centroid))) DESC,
                          cents.label) AS rn
        FROM probes CROSS JOIN cents
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT a.probe_id, a.cell, e.vec_id AS neighbor_id,
             round(list_dot_product(a.p, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(a.p, a.p))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))), 6) AS cos_sim
      FROM assigned a
      JOIN embeddings e ON e.label = a.cell AND e.vec_id <> a.probe_id
    )
    SELECT probe_id, cell, neighbor_id, cos_sim, rn FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rn
      FROM scored
    ) WHERE rn <= 10
    """


@query("similarity_ivf_topk", oracle=_IVF_SQL)
def similarity_ivf_topk(spark, sf_dir):
    """IVF-style ANN: label-mean centroids as the codebook; each probe
    scores only its nearest cell — the partition-pruned scale path
    (cells = parquet partitions at 100 TB). Exact within the cell."""
    return S.ivf_topk(load_table(spark, sf_dir, "embeddings"), PROBE_IDS, k=10)


@query(
    "similarity_lsh_bucket_sizes",
    oracle="""
    SELECT bucket, count(*)::BIGINT AS n_vecs FROM (
      SELECT (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
            + CASE WHEN embedding[17] > 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[33] > 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[49] > 0 THEN 1 ELSE 0 END)::INT AS bucket
      FROM embeddings
    ) GROUP BY bucket
    """,
)
def similarity_lsh_bucket_sizes(spark, sf_dir):
    """Random-hyperplane LSH bucketing (sign bits of 4 fixed axes →
    16 buckets): the hash-partitioning that turns ANN into an
    equi-join on bucket at scale. Output: bucket occupancy."""
    e = load_table(spark, sf_dir, "embeddings")
    bucket = (
        F.when(F.element_at("embedding", 1) > 0, 8).otherwise(0)
        + F.when(F.element_at("embedding", 17) > 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 33) > 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 49) > 0, 1).otherwise(0)
    )
    return (
        e.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def _hyperplane_bucket_sql(col: str = "embedding") -> str:
    """DuckDB twin of operators.similarity.hyperplane_bucket — inlines
    the IDENTICAL md5-derived ±1 constants."""
    terms = []
    for j, row in enumerate(S.hyperplane_signs()):
        arr = ",".join(str(s) for s in row)
        terms.append(
            f"(CASE WHEN list_dot_product({col}::DOUBLE[], [{arr}]::DOUBLE[]) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"


_HYPERPLANE_SQL = f"""
    WITH sigd AS (
      SELECT vec_id, embedding, {_hyperplane_bucket_sql()} AS bucket
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS p, bucket
      FROM sigd WHERE vec_id IN {_PROBES_SQL}
    ),
    scored AS (
      SELECT probes.probe_id, probes.bucket, e.vec_id AS neighbor_id,
             round(list_dot_product(p, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(p, p))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))), 6) AS cos_sim
      FROM probes JOIN sigd e ON probes.bucket = e.bucket
                             AND probes.probe_id <> e.vec_id
    )
    SELECT probe_id, bucket, neighbor_id, cos_sim, rn FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rn
      FROM scored
    ) WHERE rn <= 10
    """


@query("similarity_hyperplane_ann_topk", oracle=_HYPERPLANE_SQL)
def similarity_hyperplane_ann_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN: md5-derived ±1 hyperplanes → sign
    signature → bucket equi-join → exact cosine top-10 within the
    bucket. The LSH-bucketed scale path the north-star names alongside
    IVF: the bucket column becomes the hash-partition key at 100 TB,
    making ANN a co-located join instead of a corpus scan."""
    return S.hyperplane_ann_topk(
        load_table(spark, sf_dir, "embeddings"), PROBE_IDS, k=10
    )
