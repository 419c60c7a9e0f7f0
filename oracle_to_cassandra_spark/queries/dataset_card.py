"""Dataset-card roll-up: the per-source datasheet a curation run
publishes next to a training corpus (Gebru et al., "Datasheets for
Datasets") — volume, token mass, mean quality, exact-duplication rate,
and language mix, one row per source, composed from the same formulas
the per-doc queries use (operators/text.py mirrored into SQL).

Scale: one documents scan computes every per-doc metric inline
(codegen); the only corpus-sized shuffle is the md5-keyed duplicate
count (16-byte keys, map-side combined); everything else aggregates to
source-count-sized tables, and the language-mix branch joins back
broadcast. Float hygiene: the mean quality is summed as integer
micro-units so the per-source average cannot flip on a rounding
boundary between engines (the class ADVICE r5 flagged).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators import text as TX
from oracle_to_cassandra_spark.queries.text_analysis import QUALITY_SQL, _TOK
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

_CARD_SQL = f"""
    WITH per_doc AS (
      SELECT doc_id, source, lang,
             len({_TOK})::BIGINT AS n_tokens,
             CAST(round(round({QUALITY_SQL}, 6) * 1000000) AS BIGINT) AS q_micro,
             md5(text) AS h
      FROM documents
    ),
    dup AS (
      SELECT h, count(*) AS df FROM per_doc GROUP BY h
    ),
    base AS (
      SELECT p.source,
             count(*)::BIGINT AS n_docs,
             sum(p.n_tokens)::BIGINT AS total_tokens,
             round((sum(p.q_micro)::DOUBLE / 1000000.0) / count(*), 6)
               AS mean_quality,
             sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END)::BIGINT AS n_exact_dup_docs,
             round(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS dup_ratio,
             count(DISTINCT p.lang)::BIGINT AS n_langs
      FROM per_doc p JOIN dup d USING (h)
      GROUP BY p.source
    ),
    lc AS (
      SELECT source, lang, count(*) AS c FROM per_doc GROUP BY source, lang
    ),
    top_lang AS (
      -- share must be windowed BEFORE the rn filter (WHERE runs before
      -- window functions in the same SELECT, which would make every
      -- share 1.0)
      SELECT source, lang AS top_lang, share AS top_lang_share FROM (
        SELECT source, lang,
               row_number() OVER (PARTITION BY source
                                  ORDER BY c DESC, lang) AS rn,
               round(c * 1.0 / sum(c) OVER (PARTITION BY source), 6) AS share
        FROM lc
      ) WHERE rn = 1
    )
    SELECT b.source, b.n_docs, b.total_tokens, b.mean_quality,
           b.n_exact_dup_docs, b.dup_ratio, b.n_langs,
           t.top_lang, t.top_lang_share
    FROM base b JOIN top_lang t USING (source)
    """


@query("dataset_card_per_source", oracle=_CARD_SQL)
def dataset_card_per_source(spark, sf_dir):
    """One datasheet row per source: document count, total whitespace
    tokens, mean composite quality, exact-duplicate incidence (md5 of
    the full text, corpus-wide), language count, and the dominant
    language with its share — the summary table a data-governance
    review reads before a corpus ships to training."""
    d = load_table(spark, sf_dir, "documents")
    tok = TX.tokens(F.col("text"))
    per_doc = d.select(
        "doc_id",
        "source",
        "lang",
        F.size(tok).cast("long").alias("n_tokens"),
        F.round(F.round(TX.quality_score(F.col("text")), 6) * 1000000)
        .cast("long")
        .alias("q_micro"),
        F.md5("text").alias("h"),
    )
    dup = per_doc.groupBy("h").agg(F.count("*").alias("df"))
    joined = per_doc.join(dup, "h")
    base = joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            (F.sum("q_micro").cast("double") / 1000000.0) / F.count("*"), 6
        ).alias("mean_quality"),
        F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_exact_dup_docs"),
        F.round(
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)) / F.count("*"), 6
        ).alias("dup_ratio"),
        F.count_distinct("lang").alias("n_langs"),
    )
    lc = per_doc.groupBy("source", "lang").agg(F.count("*").alias("c"))
    w_rank = Window.partitionBy("source").orderBy(F.desc("c"), "lang")
    w_tot = Window.partitionBy("source")
    top_lang = (
        lc.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("tot", F.sum("c").over(w_tot))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.round(F.col("c") / F.col("tot"), 6).alias("top_lang_share"),
        )
    )
    return base.join(F.broadcast(top_lang), "source").select(
        "source", "n_docs", "total_tokens", "mean_quality",
        "n_exact_dup_docs", "dup_ratio", "n_langs", "top_lang",
        "top_lang_share",
    )
