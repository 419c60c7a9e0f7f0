"""Text-analysis queries over ``documents`` (north-star: token
counting, quality scoring, language-ID heuristic, fingerprinting).
Every formula lives once in ``operators/text.py`` and is mirrored
literally into the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.functions.hashing import MERSENNE_P, base31_sql
from oracle_to_cassandra_spark.operators import text as TX
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

_SW = "('the', 'a', 'of', 'and', 'to')"  # EN_STOPWORDS as SQL literal
_TOK = "string_split(lower(text), ' ')"

#: shared DuckDB fragments mirroring operators/text.py — composite
#: queries (corpus_curation_pipeline) embed these so the formulas
#: exist once per engine
STOP_RATIO_SQL = (
    f"(len(list_filter({_TOK}, t -> t IN {_SW})) * 1.0 / greatest(len({_TOK}), 1))"
)
QUALITY_SQL = (
    f"(0.4 * (len(list_distinct({_TOK})) * 1.0 / greatest(len({_TOK}), 1))"
    f" + 0.4 * (1 - {STOP_RATIO_SQL})"
    f" + 0.2 * least(len({_TOK}) / 100.0, 1.0))"
)


@query(
    "token_counts_documents",
    oracle=f"""
    SELECT doc_id,
           len({_TOK})::INT AS n_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::INT
             AS n_bpe_ish,
           length(text)::INT AS n_chars
    FROM documents
    """,
)
def token_counts_documents(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex tokens +
    chars. One scan, all codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
        F.length("text").alias("n_chars"),
    )


@query(
    "quality_scores_documents",
    oracle=f"""
    SELECT doc_id,
           round(len(list_distinct({_TOK})) * 1.0 / greatest(len({_TOK}), 1), 6)
             AS diversity,
           round(len(list_filter({_TOK}, t -> t IN {_SW})) * 1.0
                 / greatest(len({_TOK}), 1), 6) AS stop_ratio,
           round(0.4 * (len(list_distinct({_TOK})) * 1.0 / greatest(len({_TOK}), 1))
               + 0.4 * (1 - len(list_filter({_TOK}, t -> t IN {_SW})) * 1.0
                            / greatest(len({_TOK}), 1))
               + 0.2 * least(len({_TOK}) / 100.0, 1.0), 6) AS quality
    FROM documents
    """,
)
def quality_scores_documents(spark, sf_dir):
    """Quality scoring: vocabulary diversity, stopword density, length
    credit, composite score — the LLM-corpus filter-stage primitive."""
    d = load_table(spark, sf_dir, "documents")
    tok = TX.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.round(TX.distinct_ratio(tok), 6).alias("diversity"),
        F.round(TX.stopword_ratio(tok), 6).alias("stop_ratio"),
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"),
    )


@query(
    "lang_id_heuristic",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN len(list_filter({_TOK}, t -> t IN {_SW})) * 1.0
                     / greatest(len({_TOK}), 1) > 0.05 THEN 'en'
                ELSE 'other' END AS predicted_lang
    FROM documents
    """,
)
def lang_id_heuristic(spark, sf_dir):
    """Language-ID heuristic: stopword-density thresholding (the
    classic cheap n-gram/stopword language filter). The synthetic
    corpus is English-vocabulary with random ``lang`` labels, so the
    value here is the deterministic operator shape, not accuracy."""
    d = load_table(spark, sf_dir, "documents")
    tok = TX.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(TX.stopword_ratio(tok) > 0.05, "en").otherwise("other").alias("predicted_lang"),
    )


@query(
    "fingerprint_documents",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_TOK})), ' '))
             AS vocab_fingerprint,
           list_reduce(list_prepend(0::INT64,
                         list_transform({_TOK}, t -> {base31_sql('t')})),
                       (acc, h) -> (acc * 31 + h) % {MERSENNE_P})
             AS rolling_hash
    FROM documents
    """,
)
def fingerprint_documents(spark, sf_dir):
    """Document fingerprinting both ways: order-insensitive vocabulary
    fingerprint (md5 of sorted distinct tokens) and order-sensitive
    polynomial rolling hash — exact cross-engine integer arithmetic
    (see functions/hashing.py)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.sorted_token_fingerprint(F.col("text")).alias("vocab_fingerprint"),
        TX.rolling_token_hash(F.col("text")).alias("rolling_hash"),
    )


@query(
    "regexp_extraction_documents",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)         AS first_word,
           len(regexp_extract_all(text, 'data'))::INT  AS n_data_mentions,
           regexp_replace(text, ' +', '_', 'g')        AS underscored
    FROM documents
    WHERE regexp_matches(text, 'spark')
    """,
)
def regexp_extraction_documents(spark, sf_dir):
    """Regex surface: extract / extract-all / replace / match-filter."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("text").rlike("spark")).select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("data"), F.lit(0))).alias("n_data_mentions"),
        F.regexp_replace("text", " +", "_").alias("underscored"),
    )
