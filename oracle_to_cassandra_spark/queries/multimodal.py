"""Multimodal queries: binary payload metadata, Arrow-batched decode
stub, frame sampling. The fake-decode formula is deterministic
(size-derived), so even the Pandas-UDF stage is DuckDB-checkable.
"""

from __future__ import annotations

from oracle_to_cassandra_spark.operators import multimodal as M
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::INT AS n_bytes,
           'text/plain'                    AS media_kind,
           md5(text)                       AS digest
    FROM documents
    """,
)
def multimodal_binary_metadata(spark, sf_dir):
    """Binary payload column + typed metadata — the multimodal storage
    model (payload itself excluded from the compare; binary hashing is
    covered by the digest)."""
    return M.attach_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_bytes", "media_kind", "digest"
    )


@query(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::INT            AS n_bytes,
           (octet_length(encode(text)) % 640)::INT    AS width,
           (octet_length(encode(text)) % 480)::INT    AS height,
           (octet_length(encode(text)) % 5 + 1)::INT  AS n_frames
    FROM documents
    """,
)
def multimodal_decode_stub(spark, sf_dir):
    """Arrow-batched decode via mapInPandas (STUBBED decoder — see
    operators/multimodal.py): verifies the real plumbing (binary in
    Arrow batches → pandas → typed metadata out) against the same
    formula in SQL."""
    return M.decode_metadata(
        M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           (octet_length(encode(text)) % 5 + 1)::INT AS n_frames,
           unnest(range((octet_length(encode(text)) % 5 + 1)))::INT AS frame_idx
    FROM documents
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling: explode 0..n_frames-1 per document — rows
    multiply JVM-side before any decoder would run."""
    decoded = M.decode_metadata(
        M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    )
    df = M.sample_frames(decoded)
    return df.select(
        "doc_id", "n_frames", df.frame_idx.cast("int").alias("frame_idx")
    )
