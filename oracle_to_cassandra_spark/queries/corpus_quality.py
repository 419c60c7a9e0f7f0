"""Corpus-quality curation operators: PII redaction, C4-style
duplicated-span statistics, and OOV-rate against a corpus-derived
vocabulary.

Extends the reference's static relational surface
(`/root/reference/README.md:877`) with the remaining
document-hygiene passes a pretraining-data build runs before
tokenization: scrub contact strings, measure cross-document span
duplication (the C4 "three-sentence" rule, word-segment granularity
here), and report tokenizer-vocabulary coverage. Everything is
JVM-side built-ins — regexp, explode, keyed aggregation — no Python
in the hot path.

The synthetic corpus contains no PII (no digits or '@' anywhere), so
the redaction query first APPENDS deterministic synthetic contact
strings derived from (doc_id, source) — identically in Spark and the
DuckDB oracle — and then redacts them; counts and the md5 of the
redacted text are compared value-for-value, keeping the check
non-vacuous (the trap ADVICE round 2 flagged on top_bigrams_corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators.text import tokens
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

_TOK_SQL = "string_split(lower(text), ' ')"

#: redaction patterns — Java regex (Spark) and RE2 (DuckDB) agree on
#: this subset: character classes, +, literal dot escapes
EMAIL_RE = r"[a-z0-9.-]+@[a-z0-9.-]+\.com"
PHONE_RE = r"555-[0-9]+"

#: non-overlapping word-segment width for span-duplication stats
#: (C4 uses three sentences; the synthetic corpus has no sentence
#: boundaries, so fixed 8-token segments stand in)
SEG_W = 8

#: vocabulary size for OOV coverage (corpus vocabulary is 31 tokens,
#: so a top-20 vocab yields non-trivial OOV ratios)
VOCAB_K = 20


@query(
    "pii_redaction_stats",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR || '@' || source
                  || '.example.com or 555-0' || (doc_id % 100)::VARCHAR
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' alt ' || source || '-team@mail-example.com'
                          ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all(t, '{PHONE_RE}'))::BIGINT AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM aug
    """,
)
def pii_redaction_stats(spark, sf_dir):
    """PII scrubbing pass: count and mask email/phone strings, emit
    the redacted text's md5 so the oracle verifies the REPLACEMENT
    byte-for-byte, not just the counts.

    Scale: pure per-row regexp inside whole-stage codegen — no
    shuffle at all; at 100 TB this runs at scan speed and the
    redacted column is written back columnar. Patterns are anchored
    to the deterministic synthetic contact strings appended above
    (the corpus itself contains no '@' or digits — see module
    docstring)."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com or 555-0"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" alt "), F.col("source"), F.lit("-team@mail-example.com")),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "duplicate_span_stats",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_TOK_SQL} AS ws FROM documents
    ),
    segs AS (
      SELECT doc_id,
             unnest(list_transform(
               range(((len(ws) + {SEG_W - 1}) // {SEG_W})::INT),
               i -> array_to_string(ws[(i * {SEG_W} + 1):(i * {SEG_W} + {SEG_W})], ' ')
             )) AS seg
      FROM w
    ),
    df AS (
      SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
    ),
    per AS (
      SELECT s.doc_id,
             count(*) AS n_segments,
             sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS n_dup
      FROM segs s JOIN df d USING (seg)
      GROUP BY s.doc_id
    )
    SELECT doc_id,
           n_segments::BIGINT AS n_segments,
           n_dup::BIGINT AS n_dup_segments,
           round(n_dup / n_segments, 6) AS dup_ratio
    FROM per
    """,
)
def duplicate_span_stats(spark, sf_dir):
    """C4-style cross-document span duplication: chop each document
    into non-overlapping {SEG_W}-token segments, count how many of a
    document's segments also occur verbatim in at least one OTHER
    document — the per-document signal behind "remove any span that
    repeats across the corpus" curation rules.

    Scale: segments are md5-hashed to 128-bit keys BEFORE the
    corpus-wide aggregation, so both the document-frequency groupBy
    and the join back to per-doc stats shuffle 16-byte hashes, never
    segment text; the df table is vocabulary-of-segments sized. The
    per-doc rollup re-uses the same doc_id hash partitioning. Cites
    the segment slicing to the same slice/transform built-ins the
    reference's Scala examples use for column math
    (`/root/reference/README.md:592-607`) — declarative, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", tokens(F.col("text")).alias("ws"))
    segs = w.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(ws) / {SEG_W}.0) AS INT) - 1),"
                f" i -> array_join(slice(ws, i * {SEG_W} + 1, {SEG_W}), ' '))"
            )
        ).alias("seg"),
    ).select("doc_id", F.md5("seg").alias("h"))
    df_counts = segs.groupBy("h").agg(F.count_distinct("doc_id").alias("df"))
    per = (
        segs.join(df_counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_segments").cast("long").alias("n_segments"),
        F.col("n_dup").cast("long").alias("n_dup_segments"),
        F.round(F.col("n_dup") / F.col("n_segments"), 6).alias("dup_ratio"),
    )


@query(
    "oov_rate_top_vocab",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK_SQL}) AS t FROM documents
    ),
    vocab AS (
      SELECT t FROM (
        SELECT t, count(*) AS c FROM tok GROUP BY t
      ) ORDER BY c DESC, t LIMIT {VOCAB_K}
    ),
    per AS (
      SELECT tok.doc_id,
             count(*) AS n_tokens,
             sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tok LEFT JOIN vocab v ON tok.t = v.t
      GROUP BY tok.doc_id
    )
    SELECT doc_id,
           n_tokens::BIGINT AS n_tokens,
           n_oov::BIGINT AS n_oov,
           round(n_oov / n_tokens, 6) AS oov_ratio
    FROM per
    """,
)
def oov_rate_top_vocab(spark, sf_dir):
    """Tokenizer-vocabulary coverage: derive a top-{VOCAB_K} vocabulary
    from corpus term frequencies (rank ties broken lexically for
    determinism), then report each document's out-of-vocabulary token
    count and ratio — the signal that decides whether a tokenizer
    retrain or a byte-fallback is needed before a data refresh.

    Scale: phase 1 is a map-side-combined token count (shuffle is
    vocabulary-sized); the top-K vocab is a few KB and BROADCAST into
    phase 2, so the per-document pass is a scan + broadcast hash join
    + one doc_id aggregation — no corpus-sized shuffle carries token
    strings twice. In production the vocab table is the tokenizer's
    real vocab file loaded once."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "t")
        .limit(VOCAB_K)
        .select("t", F.lit(True).alias("in_vocab"))
    )
    per = (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_oov").cast("long").alias("n_oov"),
        F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_ratio"),
    )
