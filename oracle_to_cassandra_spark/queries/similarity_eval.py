"""Self-evaluating similarity/dedup variants: IVF recall@k against the
brute-force baseline, and winnowed (down-sampled) MinHash — each the
documented cost/quality trade-off lever for the 100 TB path, with the
quality loss MEASURED in-engine rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.functions.hashing import MERSENNE_P, MINHASH_A, MINHASH_B
from oracle_to_cassandra_spark.functions.vector import cosine_sx, norm_sx
from oracle_to_cassandra_spark.operators.dedup import doc_shingle_hashes, doc_shingle_hashes_sql
from oracle_to_cassandra_spark.operators.similarity import label_centroids
from oracle_to_cassandra_spark.queries.similarity import (
    PROBE_IDS,
    bruteforce_topk_sql,
    ivf_topk_sql,
)
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.staging import stage
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
        "c_sim", F.expr(cosine_sx("p_emb", "centroid"))
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
        .withColumn("cos_sim", F.expr(f"round({cosine_sx('p_emb', 'c_emb')}, 6)"))
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
    SELECT pos,
           (s1 // n) AS mean_v_micro,
           CAST(floor(sqrt(greatest((s2 - s1 * 1.0 * s1 / n) / (n - 1), 0))
                      + 0.5) AS BIGINT) AS sd_v_micro,
           round(min_v, 6) AS min_v, round(max_v, 6) AS max_v
    FROM (
      SELECT pos, count(*)::BIGINT AS n,
             sum(vu)::BIGINT AS s1, sum(vu * vu)::BIGINT AS s2,
             min(v) AS min_v, max(v) AS max_v
      FROM (
        SELECT unnest(embedding::DOUBLE[]) AS v,
               CAST(round(unnest(embedding::DOUBLE[]) * 1000000) AS BIGINT)
                 AS vu,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
      )
      GROUP BY pos
    )
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
    # mean/sd from exact integer micro-unit sums (closed-form sample
    # sd over s1/s2): identical op sequence in the oracle, so the 6-dp
    # compare cannot move with partition accumulation order
    vu = F.round(F.col("v") * 1000000).cast("long")
    sums = exploded.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.sum(vu).alias("s1"),
        F.sum(vu * vu).alias("s2"),
        F.min("v").alias("min_raw"),
        F.max("v").alias("max_raw"),
    )
    return sums.select(
        "pos",
        # exact micro-unit mean (s1 can be negative: div truncates
        # toward zero identically in both engines); sd via floor(x+.5)
        # on the identical double — no repr-vs-binary round ties
        F.expr("s1 div n").alias("mean_v_micro"),
        F.floor(
            F.sqrt(
                F.greatest(
                    (
                        F.col("s2")
                        - F.col("s1") * 1.0 * F.col("s1") / F.col("n")
                    )
                    / (F.col("n") - 1),
                    F.lit(0.0),
                )
            )
            + 0.5
        )
        .cast("long")
        .alias("sd_v_micro"),
        F.round(F.col("min_raw"), 6).alias("min_v"),
        F.round(F.col("max_raw"), 6).alias("max_v"),
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


_CENTS_SQL = """
  SELECT label, list(c ORDER BY pos) AS centroid FROM (
    SELECT label, pos, (sum(CAST(round(v * 1000000) AS BIGINT))::BIGINT / 1000000.0)
           / count(v) AS c FROM (
      SELECT label, unnest(embedding::DOUBLE[]) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ) GROUP BY label, pos
  ) GROUP BY label
"""

_REFINE_SQL = f"""
WITH cents AS ({_CENTS_SQL}),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.label AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding::DOUBLE[], c.centroid)
                      / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                               e.embedding::DOUBLE[]))
                         * sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                      c.label) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
counts AS (
  SELECT cell, count(*)::BIGINT AS n_vectors FROM assigned GROUP BY cell
),
newc AS (
  SELECT cell, list(c ORDER BY pos) AS centroid FROM (
    SELECT cell, pos, (sum(CAST(round(v * 1000000) AS BIGINT))::BIGINT / 1000000.0)
           / count(v) AS c FROM (
      SELECT a.cell, unnest(e.embedding::DOUBLE[]) AS v,
             generate_subscripts(e.embedding, 1) AS pos
      FROM assigned a JOIN embeddings e USING (vec_id)
    ) GROUP BY cell, pos
  ) GROUP BY cell
)
SELECT n.cell, ct.n_vectors,
       round(sqrt(list_dot_product(n.centroid, n.centroid)), 6) AS centroid_l2,
       round(list_dot_product(n.centroid, o.centroid)
             / (sqrt(list_dot_product(n.centroid, n.centroid))
                * sqrt(list_dot_product(o.centroid, o.centroid))), 6)
         AS shift_cos
FROM newc n
JOIN cents o ON o.label = n.cell
JOIN counts ct ON ct.cell = n.cell
ORDER BY n.cell
"""


@query("ivf_centroid_refinement", oracle=_REFINE_SQL)
def ivf_centroid_refinement(spark, sf_dir):
    """One Lloyd (k-means) iteration over the IVF codebook: reassign
    every vector to its nearest centroid by cosine, recompute the
    cell means, and report per refined cell its population, its new
    centroid's L2 norm, and how far it moved (cosine between old and
    new centroid — the convergence signal an iterative driver loop
    tests against a threshold).

    Scale: the assignment step is the canonical map-side pattern —
    the 10×64 codebook broadcasts, each corpus vector scores all
    cells in its own task, and ``max_by`` over a (sim, −label) struct
    picks the argmax WITH map-side partial aggregation (a window
    would buffer and sort the 10× exploded rows). The recompute step
    is posexplode → per-(cell, dim) avg — the same mergeable-partials
    shape as label_centroids. Per iteration the corpus is scanned
    once and shuffled only at vec_id (argmax) and (cell, dim) (means)
    granularity; state between iterations is the 10-row codebook.

    Reference analog: README.md:792-812's denormalizing join, lifted
    to an iterative refinement the reference engine cannot express
    without a driver-side loop — here the loop body itself is one
    declarative plan."""
    e = load_table(spark, sf_dir, "embeddings")
    # rename the codebook key up front: `embeddings` itself carries a
    # `label` column, and the crossJoin would make it ambiguous.
    # The codebook feeds TWO branches (assignment + shift); without
    # materialization each branch re-runs the full centroid pipeline
    # (scan + posexplode + two aggs — measured: 12 exchanges). The
    # 10-row localCheckpoint is the iterative-algorithm state handoff,
    # same as the connected-components loop (operators/graph.py).
    cents = (
        label_centroids(e)
        .select(F.col("label").alias("cand_cell"), "centroid")
    )
    cents = stage(cents, eager=True)
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cand_cell",
        F.expr(cosine_sx("embedding", "centroid")).alias("c_sim"),
    )
    assigned = scored.groupBy("vec_id").agg(
        F.max_by(
            "cand_cell", F.struct(F.col("c_sim"), (-F.col("cand_cell")).alias("nl"))
        ).alias("cell")
    )
    # the assignment feeds TWO branches (member gather + cell counts)
    # but needs NO explicit staging: both branches end in the same
    # physical plan, whose identical argmax exchanges AQE stage-reuse
    # dedups at runtime — an explicit localCheckpoint here measured
    # SLOWER (1.49 → 1.72 s, r14 A/B; reuse doesn't show in the
    # pre-execution explain, which is why it looks like double work)
    members = assigned.join(e.select("vec_id", "embedding"), "vec_id")
    dims = members.select(
        "cell", F.posexplode("embedding").alias("pos", "v")
    ).groupBy("cell", "pos").agg(
        (
            (
                F.sum(
                    F.round(F.col("v").cast("double") * 1000000).cast("long")
                )
                / 1000000.0
            )
            / F.count("v")
        ).alias("c")
    )
    newc = (
        dims.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "cell", F.transform("pc", lambda s: s.getField("c")).alias("new_centroid")
        )
    )
    counts = assigned.groupBy("cell").agg(F.count("*").alias("n_vectors"))

    return (
        newc.join(counts, "cell")
        .join(F.broadcast(cents), F.col("cell") == F.col("cand_cell"))
        .select(
            "cell",
            "n_vectors",
            F.expr(f"round({norm_sx('new_centroid')}, 6)").alias("centroid_l2"),
            F.expr(f"round({cosine_sx('new_centroid', 'centroid')}, 6)").alias(
                "shift_cos"
            ),
        )
        .orderBy("cell")
    )


def _multiprobe_sql() -> str:
    from oracle_to_cassandra_spark.queries.similarity import (
        _PROBES_SQL,
        _hyperplane_bucket_sql,
    )

    return f"""
    WITH sigd AS (
      SELECT vec_id, embedding, {_hyperplane_bucket_sql()} AS bucket
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS p,
             bucket AS home_bucket
      FROM sigd WHERE vec_id IN {_PROBES_SQL}
    ),
    pb AS (
      SELECT probe_id, p, home_bucket,
             unnest([home_bucket, xor(home_bucket, 1), xor(home_bucket, 2),
                     xor(home_bucket, 4), xor(home_bucket, 8)]) AS probe_bucket
      FROM probes
    ),
    cands AS (
      SELECT pb.probe_id, e.vec_id AS neighbor_id,
             (pb.probe_bucket = pb.home_bucket) AS in_single,
             round(list_dot_product(pb.p, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(pb.p, pb.p))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))), 6) AS cos_sim
      FROM pb JOIN sigd e ON pb.probe_bucket = e.bucket
                         AND pb.probe_id <> e.vec_id
    ),
    multi_top AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT probe_id, neighbor_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM cands
      ) WHERE rn <= 10
    ),
    single_top AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT probe_id, neighbor_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM cands WHERE in_single
      ) WHERE rn <= 10
    ),
    exact AS ({bruteforce_topk_sql()}),
    counts AS (
      SELECT probe_id,
             sum(CASE WHEN in_single THEN 1 ELSE 0 END)::BIGINT AS n_cand_single,
             count(*)::BIGINT AS n_cand_multi
      FROM cands GROUP BY probe_id
    ),
    rs AS (
      SELECT x.probe_id, count(s.neighbor_id)::BIGINT AS hit_single
      FROM exact x LEFT JOIN single_top s
        ON x.probe_id = s.probe_id AND x.neighbor_id = s.neighbor_id
      GROUP BY x.probe_id
    ),
    rm AS (
      SELECT x.probe_id, count(m.neighbor_id)::BIGINT AS hit_multi
      FROM exact x LEFT JOIN multi_top m
        ON x.probe_id = m.probe_id AND x.neighbor_id = m.neighbor_id
      GROUP BY x.probe_id
    )
    SELECT c.probe_id, c.n_cand_single, c.n_cand_multi,
           round(rs.hit_single / 10.0, 2) AS recall_single,
           round(rm.hit_multi / 10.0, 2) AS recall_multi
    FROM counts c
    JOIN rs ON rs.probe_id = c.probe_id
    JOIN rm ON rm.probe_id = c.probe_id
    """


@query("lsh_multiprobe_recall", oracle=_multiprobe_sql())
def lsh_multiprobe_recall(spark, sf_dir):
    """Multi-probe LSH (Lv et al. 2007), the scale lever the
    single-bucket hyperplane ANN docstring promises: probe the home
    bucket PLUS every bucket at signature Hamming distance 1 (flip
    each of the 4 sign bits), and measure — per probe — how many
    candidates each strategy scores and the recall@10 each achieves
    against the exact cosine top-10. Multi-probe buys recall without
    adding hyperplanes or replicating the index: 5 bucket lookups
    instead of 1, still never a corpus scan.

    Scale: the probe×bucket expansion is 5 rows per probe joined
    against the bucket-keyed index (broadcast probe side, co-located
    at 100 TB where bucket is the partition key); every ranking and
    overlap count is bounded by candidates-per-probe, and the exact
    side is the bounded 5-probe brute-force audit."""
    from oracle_to_cassandra_spark.operators.similarity import (
        brute_force_topk,
        hyperplane_bucket_sx,
        hyperplane_signs,
    )
    from oracle_to_cassandra_spark.queries.similarity import PROBE_IDS

    e = load_table(spark, sf_dir, "embeddings")
    signs = hyperplane_signs()
    sigd = e.select(
        "vec_id",
        "embedding",
        F.expr(hyperplane_bucket_sx("embedding", signs)).alias("bucket"),
    )
    probes = sigd.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("bucket").alias("home_bucket"),
    )
    pb = probes.select(
        "probe_id",
        "p_emb",
        "home_bucket",
        F.explode(
            F.array(
                F.col("home_bucket"),
                *[
                    F.col("home_bucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(len(signs))
                ],
            )
        ).alias("bucket"),
    )
    cands = (
        F.broadcast(pb)
        .join(sigd, "bucket")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("bucket") == F.col("home_bucket")).alias("in_single"),
            F.expr(f"round({cosine_sx('p_emb', 'embedding')}, 6)").alias("cos_sim"),
        )
    )
    cands = stage(cands)
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    multi_top = (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "neighbor_id", F.lit(True).alias("hit_m"))
    )
    single_top = (
        cands.filter("in_single")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "neighbor_id", F.lit(True).alias("hit_s"))
    )
    counts = cands.groupBy("probe_id").agg(
        F.sum(F.when(F.col("in_single"), 1).otherwise(0))
        .cast("long")
        .alias("n_cand_single"),
        F.count("*").alias("n_cand_multi"),
    )
    exact = brute_force_topk(e, PROBE_IDS, k=10).select("probe_id", "neighbor_id")
    overl = (
        exact.join(F.broadcast(single_top), ["probe_id", "neighbor_id"], "left")
        .join(F.broadcast(multi_top), ["probe_id", "neighbor_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.round(
                F.sum(F.when(F.col("hit_s"), 1).otherwise(0)) / 10.0, 2
            ).alias("recall_single"),
            F.round(
                F.sum(F.when(F.col("hit_m"), 1).otherwise(0)) / 10.0, 2
            ).alias("recall_multi"),
        )
    )
    return counts.join(F.broadcast(overl), "probe_id").select(
        "probe_id", "n_cand_single", "n_cand_multi", "recall_single", "recall_multi"
    )


_HARDNEG_SQL = """
    SELECT probe_id, neighbor_id, neg_label, cos_sim, rn FROM (
      SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
             e.label AS neg_label,
             round(list_dot_product(p.embedding::DOUBLE[], e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(p.embedding::DOUBLE[],
                                            p.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(list_dot_product(p.embedding::DOUBLE[],
                                               e.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(p.embedding::DOUBLE[],
                                          p.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                            e.embedding::DOUBLE[]))), 6) DESC,
                 e.vec_id
             )::BIGINT AS rn
      FROM embeddings p JOIN embeddings e
        ON p.label <> e.label
      WHERE p.vec_id IN (0, 100, 200, 300, 400)
    ) WHERE rn <= 5
    """


@query("hard_negative_mining", oracle=_HARDNEG_SQL)
def hard_negative_mining(spark, sf_dir):
    """Contrastive-training pair generation: for each anchor (probe),
    the top-5 most-similar vectors with a DIFFERENT label — the hard
    negatives metric-learning losses (triplet, InfoNCE) are starved
    without. Easy negatives are free (any random other-label vector);
    the hard ones require exactly this ranked cross-label search, so
    it belongs next to the ANN family it reuses.

    Scale: anchors broadcast; the label inequality rides the same
    scored scan as brute-force top-k and the per-anchor rank is a
    WindowGroupLimit. With an IVF/LSH index the candidate set drops
    to neighboring cells minus the anchor's own label partition —
    same pruning lever as the positive search."""
    from oracle_to_cassandra_spark.queries.similarity import PROBE_IDS

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("label").alias("p_label"),
    )
    cands = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("label").alias("neg_label"),
    )
    scored = (
        F.broadcast(probes)
        .join(cands, F.col("p_label") != F.col("neg_label"))
        .select(
            "probe_id",
            "neighbor_id",
            "neg_label",
            F.expr(f"round({cosine_sx('p_emb', 'c_emb')}, 6)").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id", "neg_label", "cos_sim", "rn")
    )


_SEP_SQL = """
    WITH cents AS (
      SELECT label, list(c ORDER BY pos) AS centroid FROM (
        SELECT label, pos, (sum(CAST(round(v * 1000000) AS BIGINT))::BIGINT / 1000000.0)
           / count(v) AS c FROM (
          SELECT label, unnest(embedding::DOUBLE[]) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings
        ) GROUP BY label, pos
      ) GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(list_dot_product(a.centroid, b.centroid)
                 / (sqrt(list_dot_product(a.centroid, a.centroid))
                    * sqrt(list_dot_product(b.centroid, b.centroid))), 6)
             AS centroid_cos
    FROM cents a JOIN cents b ON a.label < b.label
    """


@query("label_centroid_separation", oracle=_SEP_SQL)
def label_centroid_separation(spark, sf_dir):
    """Cluster-geometry audit: pairwise cosine between every pair of
    label centroids — the separation map that explains every other
    ANN number in this repo (IVF recall is high because these
    centroids are far apart; PQ recall is low because within-cluster
    structure dominates). In production this is the domain-similarity
    matrix that guides mixture design: domains whose centroids cos >
    0.9 are near-duplicates at the distribution level.

    Scale: centroids are a K-row table (posexplode + per-dim avg,
    mergeable partials); the K×K/2 pair join is driver-trivial and
    BROADCAST; the corpus is scanned exactly once."""
    from oracle_to_cassandra_spark.functions.vector import cosine_sx, norm_sx

    e = load_table(spark, sf_dir, "embeddings")
    cents = stage(label_centroids(e), eager=True)
    a = cents.select(
        F.col("label").alias("label_a"), F.col("centroid").alias("ca")
    )
    b = cents.select(
        F.col("label").alias("label_b"), F.col("centroid").alias("cb")
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.expr(f"round({cosine_sx('ca', 'cb')}, 6)").alias("centroid_cos"),
        )
    )


_DRIFT_SQL = """
    WITH halves AS (
      SELECT label, vec_id % 2 AS half,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000000) AS BIGINT) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    dim_sums AS (
      SELECT label, pos,
             sum(CASE WHEN half = 0 THEN v END)::BIGINT AS s_a,
             sum(CASE WHEN half = 1 THEN v END)::BIGINT AS s_b
      FROM halves GROUP BY label, pos
    ),
    counts AS (
      SELECT label,
             sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
      FROM embeddings GROUP BY label
    )
    SELECT d.label, c.n_a, c.n_b,
           sum(abs(coalesce(d.s_a, 0) * c.n_b
                   - coalesce(d.s_b, 0) * c.n_a))::BIGINT AS l1_numer,
           (sum(abs(coalesce(d.s_a, 0) * c.n_b
                    - coalesce(d.s_b, 0) * c.n_a)) // (c.n_a * c.n_b))::BIGINT
             AS l1_drift_micro
    FROM dim_sums d JOIN counts c ON d.label = c.label
    WHERE c.n_a > 0 AND c.n_b > 0
    GROUP BY d.label, c.n_a, c.n_b
    """


@query("embedding_centroid_drift", oracle=_DRIFT_SQL)
def embedding_centroid_drift(spark, sf_dir):
    """Embedding distribution drift between two ingestion epochs
    (vec_id parity stands in for epoch): per label, the L1 distance
    between the two epochs' centroids — the monitoring number that
    catches a silently retrained or renormalized encoder before a
    100 TB re-embedding job is wasted. Computed EXACTLY in integer
    micro-units: the comparison |sA_d/nA − sB_d/nB| is cleared of
    denominators to |sA_d·nB − sB_d·nA| (Σ_d, then one floor-divide
    by nA·nB) so both engines agree bit-for-bit — no float summation
    order anywhere.

    Scale: one posexplode pass to (label, dim) partial sums
    (mergeable, map-side combined; dims×labels rows total) plus a
    label-sized count join. Int64 holds Σ_d |s·n| up to ~10⁹ vectors
    per label at micro precision; beyond that the same plan runs on
    DECIMAL(38,0)."""
    e = load_table(spark, sf_dir, "embeddings")
    half = (F.col("vec_id") % 2).alias("half")
    exploded = e.select(
        "label",
        half,
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    ).select(
        "label",
        "half",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("v") * 1000000).cast("long").alias("v"),
    )
    dim_sums = exploded.groupBy("label", "pos").agg(
        F.sum(F.when(F.col("half") == 0, F.col("v"))).alias("s_a"),
        F.sum(F.when(F.col("half") == 1, F.col("v"))).alias("s_b"),
    )
    counts = e.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0)).alias("n_b"),
    ).filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    term = F.abs(
        F.coalesce(F.col("s_a"), F.lit(0)) * F.col("n_b")
        - F.coalesce(F.col("s_b"), F.lit(0)) * F.col("n_a")
    )
    return (
        dim_sums.join(F.broadcast(counts), "label")
        .groupBy("label", "n_a", "n_b")
        .agg(
            F.sum(term).alias("l1_numer"),
            F.floor(F.sum(term) / (F.col("n_a") * F.col("n_b")))
            .cast("long")
            .alias("l1_drift_micro"),
        )
    )
