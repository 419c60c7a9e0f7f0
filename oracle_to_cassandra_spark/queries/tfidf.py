"""Corpus statistics: TF-IDF weights and n-gram frequency — the
feature-extraction stage between text cleaning and model training.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators.text import shingles, tokens
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

_TOK = "string_split(lower(text), ' ')"


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest({_TOK}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM tokens GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tokens GROUP BY term
    ),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term)::BIGINT AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """TF-IDF: term frequency × inverse document frequency, top-3
    terms per document.

    Scale/plan: the token stream is exploded and aggregated ONCE
    (tf by doc,term); document frequency is then a window count over
    the tf rows — tf rows are already distinct (doc, term), so
    ``count(*) over (partition by term)`` IS df. This replaces the
    earlier second explode+groupBy over the raw token stream (the
    token stream is corpus-sized; tf is vocabulary×doc-sized) and the
    df join. Three exchanges total, all on the compact tf relation."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    w_df = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count("*").over(w_df))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "top_bigrams_corpus",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
    bigrams AS (
      SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
                                   i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, count(*)::BIGINT AS freq FROM bigrams
    GROUP BY bigram
    HAVING count(*) >= greatest(5, (SELECT count(*) FROM documents) // 200)
    """,
)
def top_bigrams_corpus(spark, sf_dir):
    """Corpus-wide bigram frequency above a scale-aware floor —
    collocation statistics for tokenizer/vocab construction. Map-side
    partial counts keep the shuffle at vocabulary size, not
    token-stream size.

    The floor is ``max(5, n_docs / 200)`` rather than a constant: a
    fixed absolute count is vacuous at small SF (round 2's driver
    check compared two empty results) and too permissive at 100 TB,
    while a per-document rate holds the output at vocabulary scale
    across any corpus size.

    Plan note: bigrams are ``shingles(tok, k=2)`` — the zip_with fold
    that evaluates the split array a constant number of times per ROW.
    The earlier ``transform(idx, i -> element_at(tok, i))`` form
    re-evaluated the split per ELEMENT (higher-order funcs are
    CodegenFallback with no subexpression elimination), i.e. O(n²)
    per document — measured 4× slower on the sf0.1 corpus."""
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    bigrams = docs.select(F.explode(shingles(tok, k=2)).alias("bigram"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("freq") >= F.greatest(F.lit(5), F.floor(F.col("n_docs") / 200))
        )
        .select("bigram", "freq")
    )
