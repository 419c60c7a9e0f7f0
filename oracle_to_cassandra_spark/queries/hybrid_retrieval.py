"""Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009):
fuse the BM25 sparse ranking and a dense embedding-cosine ranking for
one query into a single top-10 — the retrieval shape modern RAG /
search stacks run, composed from this repo's existing sparse
(bm25_retrieval_topk) and dense (brute-force cosine) primitives.

RRF is rank-only — ``score = Σ_sides 1/(60 + rank)`` — so it needs no
score calibration between BM25 log-space and cosine [-1, 1] space,
which is exactly why production stacks use it. Ranks are exact
integers in both engines, so the fusion is float-exact by
construction (1/(60+r) is the same double everywhere); only the two
upstream rankings carry rounding, and both already rank on ROUNDED
scores with doc-id tie-breaks.

Scale: each side is a bounded top-20 (TakeOrderedAndProject after
map-side scoring — never a global sort), the fusion is a 20∪20-row
full outer join, and the final top-10 ranks ≤40 rows. The corpus is
scanned once per side; nothing corpus-sized shuffles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.functions.vector import cosine_sx
from oracle_to_cassandra_spark.queries.text_analysis import (
    bm25_retrieval_topk,
    bm25_topk_sql,
)
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

#: dense-side query vector: the embedding of this vec_id (the corpus
#: shares one id space: doc_id n ↔ vec_id n)
DENSE_PROBE_ID = 0
RRF_K = 60  #: the standard RRF damping constant
SIDE_K = 20  #: depth of each side's candidate list
TOP_K = 10

_DENSE_SQL = f"""
    SELECT neighbor_id AS doc_id, rnk FROM (
      SELECT e.vec_id AS neighbor_id,
             row_number() OVER (
               ORDER BY round(list_dot_product(p.embedding::DOUBLE[],
                                               e.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(p.embedding::DOUBLE[],
                                          p.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                            e.embedding::DOUBLE[]))), 6) DESC,
                 e.vec_id
             ) AS rnk
      FROM embeddings e
      CROSS JOIN (SELECT embedding FROM embeddings
                  WHERE vec_id = {DENSE_PROBE_ID}) p
    ) WHERE rnk <= {SIDE_K}
    """

_RRF_SQL = f"""
    WITH bm25 AS ({bm25_topk_sql()}),
    dense AS ({_DENSE_SQL}),
    fused AS (
      SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
             round(coalesce(1.0 / ({RRF_K} + b.rnk), 0)
                   + coalesce(1.0 / ({RRF_K} + d.rnk), 0), 6) AS rrf_score,
             b.rnk AS sparse_rank, d.rnk AS dense_rank
      FROM bm25 b FULL OUTER JOIN dense d ON b.doc_id = d.doc_id
    )
    SELECT doc_id, rrf_score, sparse_rank, dense_rank,
           row_number() OVER (ORDER BY rrf_score DESC, doc_id)::BIGINT AS rnk
    FROM fused
    ORDER BY rnk LIMIT {TOP_K}
    """


@query("hybrid_rrf_retrieval", oracle=_RRF_SQL)
def hybrid_rrf_retrieval(spark, sf_dir):
    """Top-10 hybrid retrieval: BM25 top-20 for the fixed term query
    fused with the cosine top-20 for the probe embedding via
    reciprocal-rank fusion; output keeps each side's contributing
    rank (NULL = the side didn't retrieve that doc) so the fusion is
    auditable."""
    e = load_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == DENSE_PROBE_ID).select(
        F.col("embedding").alias("p_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(f"round({cosine_sx('embedding', 'p_emb')}, 6)").alias("c"),
        )
        .orderBy(F.desc("c"), "doc_id")
        .limit(SIDE_K)
    )
    w_dense = Window.orderBy(F.desc("c"), "doc_id")
    dense = scored.select(
        "doc_id", F.row_number().over(w_dense).alias("dense_rank")
    )
    sparse = bm25_retrieval_topk(spark, sf_dir).select(
        "doc_id", F.col("rnk").cast("int").alias("sparse_rank")
    )
    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("sparse_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
            F.col("sparse_rank").cast("long").alias("sparse_rank"),
            F.col("dense_rank").cast("long").alias("dense_rank"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(TOP_K)
    )
    w = Window.orderBy(F.desc("rrf_score"), "doc_id")
    return fused.select(
        "doc_id",
        "rrf_score",
        "sparse_rank",
        "dense_rank",
        F.row_number().over(w).cast("long").alias("rnk"),
    ).orderBy("rnk")
