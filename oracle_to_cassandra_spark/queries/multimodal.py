"""Multimodal queries: binary payload metadata + REAL byte-walked
decoders (PNG/BMP/WAV/Y4M/TAR) over planted spec-compliant blobs,
each checked closed-form by its oracle. The remaining size-formula
fake decode (frame sampling) is deterministic, so even that
Pandas-UDF stage is DuckDB-checkable.
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


def _bmp_header_oracle() -> str:
    from oracle_to_cassandra_spark.operators.multimodal import BMP_H, BMP_W

    return f"""
    WITH s AS (
      SELECT doc_id, ({BMP_W})::INT AS w, ({BMP_H})::INT AS h,
             ((({BMP_W}) * 3 + 3) // 4 * 4)::INT AS stride
      FROM documents
    )
    SELECT doc_id, (54 + stride * h)::INT AS n_bytes, 54::INT AS data_offset,
           w AS width, h AS height, 24::INT AS bpp, stride,
           (stride * h)::INT AS img_bytes
    FROM s
    """


@query("multimodal_bmp_header_decode", oracle=_bmp_header_oracle())
def multimodal_bmp_header_decode(spark, sf_dir):
    """REAL header decode via PANDAS-batched mapInPandas (retires the
    size-formula decode stub): plant the spec-compliant 24bpp BMPs,
    then little-endian struct-unpack BITMAPFILEHEADER +
    BITMAPINFOHEADER in Python, cross-checking the declared file size
    against the actual blob length and the declared image size
    against the stride-aligned pixel area. Every emitted field is
    parsed from header BYTES and the oracle restates them closed-form
    from the planting geometry — a construction or parsing bug breaks
    the magic, a cross-check, or a dimension. Complements
    decode_png_headers (big-endian chunk walk) with the little-endian
    fixed-layout case, and keeps the pandas (non-Arrow-native) batch
    plumbing under test."""
    d = load_table(spark, sf_dir, "documents")
    return M.decode_bmp_headers(M.plant_bmp_blobs(d))


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


@query(
    "multimodal_png_header_decode",
    oracle="""
    SELECT doc_id,
           45::INT                   AS n_bytes,
           (16 + doc_id % 320)::INT  AS width,
           (16 + doc_id % 240)::INT  AS height,
           8::INT                    AS bit_depth,
           6::INT                    AS color_type,
           true                      AS crc_ok
    FROM documents WHERE doc_id % 2 = 0
    """,
)
def multimodal_png_header_decode(spark, sf_dir):
    """REAL image decode path (upgrades the size-formula stub): plant
    spec-compliant PNG blobs (signature + IHDR with a true CRC-32 +
    IEND, built JVM-side from hex/unhex + ``crc32``), then parse them
    byte-for-byte in Arrow-batched Python — signature check, chunk
    walk, big-endian struct unpack, zlib CRC re-verification. The
    oracle states the planted header fields in closed form, so the
    driver's hash compare certifies that genuine byte parsing happened:
    any construction or parsing bug breaks the signature, the CRC, or
    a dimension. n_bytes is the measured blob length (fixed 45-byte
    stream: 8 sig + 25 IHDR + 12 IEND)."""
    d = load_table(spark, sf_dir, "documents")
    return M.decode_png_headers(M.plant_png_blobs(d))


def _wav_stats_oracle() -> str:
    """Composed from the SAME planting constants the operator uses
    (WAV_CHANNELS / WAV_N_SAMPLES / WAV_SAMPLE) — one formula source,
    so the twins cannot drift apart."""
    from oracle_to_cassandra_spark.operators.multimodal import (
        WAV_CHANNELS,
        WAV_N_SAMPLES,
        WAV_RATES,
        WAV_SAMPLE,
    )

    rates = ", ".join(str(r) for r in WAV_RATES)
    return f"""
    WITH wav AS (
      SELECT doc_id,
             ({WAV_CHANNELS})::INT                  AS n_channels,
             ([{rates}])[doc_id % 3 + 1]            AS sample_rate,
             ({WAV_N_SAMPLES})::INT                 AS n_samples,
             list_transform(range(0, ({WAV_N_SAMPLES})::INT),
                            i -> {WAV_SAMPLE}) AS s
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT doc_id, n_channels, sample_rate::INT AS sample_rate, n_samples,
           ((n_samples // n_channels) * 1000000 // sample_rate)::BIGINT
             AS duration_us,
           list_max(list_transform(s, x -> abs(x)))::INT AS peak_amp,
           list_sum(s)::BIGINT AS sum_amp
    FROM wav
    """


@query("multimodal_wav_pcm_stats", oracle=_wav_stats_oracle())
def multimodal_wav_pcm_stats(spark, sf_dir):
    """REAL audio decode path: plant spec-compliant RIFF/WAVE blobs
    whose data chunk holds genuine int16-LE PCM samples (deterministic
    formula, two's-complement-encoded JVM-side), then walk the RIFF
    subchunks in Arrow-batched Python, unpack the PCM fmt fields,
    ``np.frombuffer`` the samples and reduce peak |amplitude| /
    amplitude sum vectorized. The oracle recomputes the PCM statistics
    from the same planting formula in closed form — matching sum and
    peak across ~tens of samples per doc is only possible if the
    bytes were actually encoded and re-parsed correctly (integer
    arithmetic end-to-end, so the compare is exact)."""
    d = load_table(spark, sf_dir, "documents")
    return M.decode_wav_pcm_stats(M.plant_wav_blobs(d))


def _bmp_oracle() -> str:
    from oracle_to_cassandra_spark.operators.multimodal import (
        BMP_B,
        BMP_G,
        BMP_H,
        BMP_R,
        BMP_W,
    )

    return f"""
    WITH dims AS (
      SELECT doc_id, ({BMP_W})::INT AS width, ({BMP_H})::INT AS height
      FROM documents
    )
    SELECT doc_id, width, height, (width * height)::INT AS n_pixels,
           list_sum(list_transform(range(0, width * height),
                                   i -> {BMP_B.format(i="i")}))::BIGINT AS sum_b,
           list_sum(list_transform(range(0, width * height),
                                   i -> {BMP_G.format(i="i")}))::BIGINT AS sum_g,
           list_sum(list_transform(range(0, width * height),
                                   i -> {BMP_R.format(i="i")}))::BIGINT AS sum_r
    FROM dims
    """


@query("multimodal_bmp_pixel_stats", oracle=_bmp_oracle())
def multimodal_bmp_pixel_stats(spark, sf_dir):
    """REAL pixel-level image decode: plant spec-compliant 24bpp BMPs
    whose pixel area is stored the way BMP stores it (bottom-up rows,
    BGR interleave, 4-byte stride padding — widths 1-4 exercise every
    pad case), then numpy-decode the actual pixel bytes and reduce
    per-channel amplitude sums. The oracle restates the per-pixel
    channel formulas in closed form; matching integer sums is only
    possible if the decoder handled stride, orientation and interleave
    correctly. This is the full image path — header fields AND pixel
    payload — one honest step short of codec work (JPEG/PNG pixel
    decompression needs libs this container doesn't ship)."""
    d = load_table(spark, sf_dir, "documents")
    return M.decode_bmp_pixel_stats(M.plant_bmp_blobs(d))


def _y4m_oracle() -> str:
    from oracle_to_cassandra_spark.operators.multimodal import (
        Y4M_H,
        Y4M_N_FRAMES,
        Y4M_U,
        Y4M_V,
        Y4M_W,
        Y4M_Y,
    )

    return f"""
    WITH dims AS (
      SELECT doc_id, ({Y4M_W})::INT AS width, ({Y4M_H})::INT AS height,
             ({Y4M_N_FRAMES})::INT AS n_frames
      FROM documents
    ),
    frames AS (
      SELECT doc_id, width, height, n_frames,
             unnest(range(0, n_frames))::INT AS frame_idx
      FROM dims
    )
    SELECT doc_id, width, height, n_frames, frame_idx,
           list_sum(list_transform(range(0, width * height),
                    j -> {Y4M_Y.format(f="frame_idx", j="j")}))::BIGINT AS sum_y,
           list_sum(list_transform(range(0, (width // 2) * (height // 2)),
                    j -> {Y4M_U.format(f="frame_idx", j="j")}))::BIGINT AS sum_u,
           list_sum(list_transform(range(0, (width // 2) * (height // 2)),
                    j -> {Y4M_V.format(f="frame_idx", j="j")}))::BIGINT AS sum_v
    FROM frames WHERE frame_idx % 2 = 0
    """


@query("multimodal_y4m_frame_sample_stats", oracle=_y4m_oracle())
def multimodal_y4m_frame_sample_stats(spark, sf_dir):
    """REAL video decode + frame sampling: plant spec-compliant
    YUV4MPEG2 streams (text header + FRAME markers + raw planar
    YUV 4:2:0 bytes — a real interchange format that needs no codec),
    then parse the header, walk the FRAME markers and decode the
    plane bytes ONLY for every 2nd frame (unsampled frames are seeked
    past — the production frame-sampling contract). One row per
    sampled frame with integer per-plane amplitude sums; the oracle
    restates the planting formulas closed-form, so matching sums
    certifies genuine container walking and plane slicing. Completes
    the real-decode trio: PNG (image headers+CRC), BMP (pixels),
    WAV (audio PCM), Y4M (video frames)."""
    d = load_table(spark, sf_dir, "documents")
    return M.decode_y4m_frame_stats(M.plant_y4m_blobs(d), sample_every=2)


@query("stream_multimodal_wav_decode", oracle=_wav_stats_oracle())
def stream_multimodal_wav_decode(spark, sf_dir):
    """Streaming twin of the real audio decode — and a fully
    DuckDB-oracled stream (not rows-only): ``readStream`` over the
    documents files (Kafka-topic analog), the SAME JVM-side WAV
    planting expressions and mapInArrow PCM decoder as the batch
    query, appended to the memory sink via an availableNow trigger.
    Proves the multimodal decode path is trigger-agnostic: identical
    per-row results whether blobs arrive as a table or as a stream —
    on a cluster this is the ingest-time feature-extraction pattern
    (decode once, on arrival, not per downstream consumer)."""
    from oracle_to_cassandra_spark.streaming.core import run_stream_to_memory

    from oracle_to_cassandra_spark.sources.parquet import read_parquet

    raw_schema = read_parquet(spark, f"{sf_dir}/documents.parquet").schema
    docs_stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    decoded = M.decode_wav_pcm_stats(M.plant_wav_blobs(docs_stream))
    return run_stream_to_memory(decoded, output_mode="append")


def _phash_oracle() -> str:
    from oracle_to_cassandra_spark.operators.multimodal import (
        BMP_B,
        BMP_G,
        BMP_H,
        BMP_R,
        BMP_W,
    )

    luma = (
        f"(299 * ({BMP_R.format(i='i')}) + 587 * ({BMP_G.format(i='i')})"
        f" + 114 * ({BMP_B.format(i='i')})) // 1000"
    )
    return f"""
    WITH g AS (
      SELECT doc_id, ({BMP_W})::INT AS width, ({BMP_H})::INT AS height,
             unnest(range(0, ({BMP_W}) * ({BMP_H})))::BIGINT AS i,
             ({luma})::BIGINT AS luma
      FROM documents
    ),
    ph AS (
      SELECT doc_id, width, height,
             sum(CASE WHEN luma * (width * height) > tot
                      THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS phash
      FROM (SELECT *, sum(luma) OVER (PARTITION BY doc_id) AS tot FROM g)
      GROUP BY doc_id, width, height
    )
    SELECT width, height, phash,
           count(*)::BIGINT AS n_images,
           min(doc_id) AS min_doc_id
    FROM ph GROUP BY width, height, phash
    HAVING count(*) >= 2
    """


@query("multimodal_phash_dedup_groups", oracle=_phash_oracle())
def multimodal_phash_dedup_groups(spark, sf_dir):
    """Image near-dup detection from DECODED CONTENT — the multimodal
    twin of text MinHash dedup: plant the 24bpp BMPs, decode the
    actual pixel bytes, compute an integer average-hash over BT.601
    luma (bit i set when pixel i outshines the image mean), and group
    images by (dims, phash). Output: every perceptual-collision group
    with its size — what an image-dedup pass feeds to keeper
    selection. The oracle recomputes the hash from the closed-form
    pixel model, so a decoder that mishandles stride, row order, or
    the BGR interleave produces different hashes and fails the match.

    Scale: the decode is Arrow-batched and embarrassingly parallel;
    the only shuffle is the (width, height, phash) group — a 16-byte
    key per image, never pixels. A real pipeline downsamples to 8×8
    before hashing, making the key constant-size regardless of image
    size; the grouping (and the Hamming-ball widening simhash dedup
    already implements for text) is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    ph = M.decode_bmp_phash(M.plant_bmp_blobs(d))
    from pyspark.sql import functions as F

    return (
        ph.groupBy("width", "height", "phash")
        .agg(
            F.count("*").alias("n_images"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_images") >= 2)
    )


def _afp_oracle() -> str:
    from oracle_to_cassandra_spark.operators.multimodal import (
        AFP_WINDOW,
        WAV_N_SAMPLES,
        WAV_SAMPLE,
    )

    import re

    v = re.sub(r"\bi\b", f"(j * {AFP_WINDOW} + k)", WAV_SAMPLE)
    return f"""
    WITH wins AS (
      SELECT doc_id,
             (({WAV_N_SAMPLES}) // {AFP_WINDOW})::INT AS n_windows,
             unnest(range(0, ({WAV_N_SAMPLES}) // {AFP_WINDOW}))::BIGINT AS j
      FROM documents WHERE doc_id % 2 = 1
    ),
    energy AS (
      SELECT doc_id, n_windows, j,
             list_sum(list_transform(range(0, {AFP_WINDOW}),
                                     k -> ({v}) * ({v})))::BIGINT AS e
      FROM wins
    ),
    bits AS (
      SELECT doc_id, n_windows, j - 1 AS b,
             CASE WHEN e > lag(e) OVER (PARTITION BY doc_id ORDER BY j)
                  THEN 1 ELSE 0 END AS bit
      FROM energy
    )
    SELECT doc_id, n_windows,
           coalesce(sum(CASE WHEN b >= 0 AND bit = 1
                             THEN (1::BIGINT << b) ELSE 0 END), 0)::BIGINT AS afp
    FROM bits GROUP BY doc_id, n_windows
    """


@query("multimodal_wav_energy_fingerprint", oracle=_afp_oracle())
def multimodal_wav_energy_fingerprint(spark, sf_dir):
    """Audio fingerprinting from DECODED CONTENT — the audio member of
    the modality-dedup matrix (text MinHash/SimHash, image phash,
    audio envelope hash): plant the spec-compliant WAVs, decode the
    int16 PCM, and emit each clip's energy-delta fingerprint (bit j =
    window j+1 louder than window j over {AFP_WINDOW}-sample
    windows). Downstream grouping is identical to the phash path;
    this query exposes the per-clip fingerprints so the oracle checks
    every decoded amplitude, not just collision counts.

    Scale: Arrow-batched decode, integer-exact energies, and the
    output is 20 bytes per clip — the fingerprint table IS the dedup
    index a 100 TB audio corpus shuffles, never the PCM."""
    d = load_table(spark, sf_dir, "documents")
    return M.decode_wav_energy_fingerprint(M.plant_wav_blobs(d))


def _vfp_oracle() -> str:
    from oracle_to_cassandra_spark.operators.multimodal import (
        Y4M_H,
        Y4M_N_FRAMES,
        Y4M_W,
        Y4M_Y,
    )

    y = Y4M_Y.format(f="f", j="j")
    return f"""
    WITH frames AS (
      SELECT doc_id, (({Y4M_N_FRAMES}))::INT AS n_frames,
             unnest(range(0, {Y4M_N_FRAMES}))::BIGINT AS f
      FROM documents
    ),
    luma AS (
      SELECT doc_id, n_frames, f,
             list_sum(list_transform(range(0, ({Y4M_W}) * ({Y4M_H})),
                                     j -> {y}))::BIGINT AS sum_y
      FROM frames
    ),
    bits AS (
      SELECT doc_id, n_frames, f,
             lag(sum_y) OVER (PARTITION BY doc_id ORDER BY f) AS prev,
             sum_y
      FROM luma
    )
    SELECT doc_id, n_frames,
           coalesce(sum(CASE WHEN prev IS NOT NULL AND sum_y > prev
                             THEN (1::BIGINT << (f - 1)) ELSE 0 END), 0)::BIGINT
             AS vfp
    FROM bits GROUP BY doc_id, n_frames
    """


@query("multimodal_y4m_temporal_fingerprint", oracle=_vfp_oracle())
def multimodal_y4m_temporal_fingerprint(spark, sf_dir):
    """Video fingerprinting — the last member of the modality-dedup
    matrix: decode EVERY frame's luma plane (sample_every=1 on the
    real Y4M walker) and emit the temporal brightness-delta hash
    (bit f−1 = frame f brighter than frame f−1), the shot-signature
    video-dedup pipelines bucket on. Pure composition: the Python
    stage is the existing frame decoder; the fingerprint itself is a
    lag window + one keyed aggregate, all JVM-side.

    Scale: per-frame luma sums are integers (no float drift across
    the frame order), the window is partitioned per clip, and the
    output is 20 bytes per video — the shuffled index, never frames."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    fs = M.decode_y4m_frame_stats(M.plant_y4m_blobs(d), sample_every=1)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    bits = fs.select(
        "doc_id",
        "n_frames",
        F.col("frame_idx").cast("long").alias("f"),
        F.lag("sum_y").over(w).alias("prev"),
        "sum_y",
    )
    return bits.groupBy("doc_id", "n_frames").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("sum_y") > F.col("prev")),
                    F.expr("shiftleft(1L, cast(f - 1 AS INT))"),
                ).otherwise(F.lit(0).cast("long"))
            ),
            F.lit(0).cast("long"),
        ).alias("vfp")
    )


@query(
    "multimodal_tar_webdataset_decode",
    oracle="""
    SELECT doc_id, member_name, member_size, content_md5 FROM (
      SELECT doc_id,
             doc_id::VARCHAR || '.txt' AS member_name,
             octet_length(encode(text))::BIGINT AS member_size,
             md5(text) AS content_md5
      FROM documents WHERE doc_id % 4 = 1 AND text IS NOT NULL
      UNION ALL
      SELECT doc_id,
             doc_id::VARCHAR || '.json',
             octet_length(encode('{"doc_id": ' || doc_id::VARCHAR || '}'))::BIGINT,
             md5('{"doc_id": ' || doc_id::VARCHAR || '}')
      FROM documents WHERE doc_id % 4 = 1
      UNION ALL
      SELECT doc_id,
             doc_id::VARCHAR || '.lang',
             octet_length(encode(lang))::BIGINT,
             md5(lang)
      FROM documents WHERE doc_id % 4 = 1 AND lang IS NOT NULL
    )
    """,
)
def multimodal_tar_webdataset_decode(spark, sf_dir):
    """WebDataset-style TAR shard decode — the standard packaging for
    multimodal training corpora (each sample = a group of same-stem
    members inside a POSIX tar): plant a real ustar archive per
    document (text payload + JSON metadata + language tag members),
    then WALK the 512-byte block structure by hand in Arrow-batched
    Python — parse each header's name and octal size, RE-VERIFY its
    octal checksum (blanked-field unsigned sum), slice the member
    data, seek past the padding. One row per member with an md5
    content digest the oracle recomputes from the source columns —
    any header-arithmetic or padding bug breaks a size, a name, or a
    digest. Members are OPTIONAL per sample (the WebDataset contract):
    a NULL field plants no member and the oracle's per-member branch
    filters the same rows out, so null-lang documents ship 2-member
    samples on both sides.

    Scale: tar shards are read SEQUENTIALLY (pointer arithmetic per
    member, no random access) — the property that lets a 100 TB
    WebDataset corpus stream at storage bandwidth; blobs ride Arrow
    batches, never shuffles."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 1
    )
    return M.decode_tar_members(M.plant_tar_blobs(d))
