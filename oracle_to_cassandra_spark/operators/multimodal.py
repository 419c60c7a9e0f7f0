"""Multimodal column operators (north-star surface).

Model: media are opaque ``binary`` payload columns with typed metadata
alongside (the reference stores everything typed-relational; this is
the extension for image/audio/video at 100 TB: parquet binary chunks +
metadata columns, decode only inside Arrow-batched Python).

The test container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (`_fake_decode_dims`); everything
around it — schema, binary handling, ``mapInPandas`` batch iteration,
partition behavior, frame-index explosion — is the real production
plumbing and is what the tests/driver verify.

Scale notes:
  * Binary payloads ride the scan; metadata predicates prune files
    before any Python runs.
  * ``mapInPandas`` processes Arrow record batches — decode cost is
    per-batch vectorizable, and ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` bounds executor memory against large blobs.
  * Frame sampling is a built-in explode of an index sequence — rows
    multiply JVM-side; only the frames selected ever reach a decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id LONG, n_bytes INT, width INT, height INT, n_frames INT"
)


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """documents → multimodal shape: utf-8 payload bytes + metadata
    (media kind, byte size, md5 digest). Stand-in for real media blobs."""
    return documents.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_kind"),
        F.octet_length("text").alias("n_bytes"),
        F.md5("text").alias("digest"),
    )


def _fake_decode_dims(n_bytes: pd.Series) -> pd.DataFrame:
    """STUB DECODER (deterministic fake): derives pretend media
    dimensions from payload size. A real build replaces this with
    PIL/ffmpeg over the payload bytes — same signature, same schema.
    Raise-on-missing alternative: ``raise NotImplementedError`` —
    kept callable so the plumbing stays testable."""
    return pd.DataFrame(
        {
            "width": (n_bytes % 640).astype("int32"),
            "height": (n_bytes % 480).astype("int32"),
            "n_frames": (n_bytes % 5).astype("int32") + 1,
        }
    )


def decode_metadata(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over (doc_id, payload)
    batches → typed media metadata."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int32")
            dims = _fake_decode_dims(n_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": dims["width"],
                    "height": dims["height"],
                    "n_frames": dims["n_frames"],
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(
        _decode, schema=DECODED_SCHEMA
    )


def sample_frames(decoded: DataFrame) -> DataFrame:
    """Frame sampling: one row per (doc, frame_idx) — the built-in
    explode of a frame-index sequence; JVM-side, no decode involved."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )
