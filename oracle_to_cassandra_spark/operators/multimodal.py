"""Multimodal column operators (north-star surface).

Model: media are opaque ``binary`` payload columns with typed metadata
alongside (the reference stores everything typed-relational; this is
the extension for image/audio/video at 100 TB: parquet binary chunks +
metadata columns, decode only inside Arrow-batched Python).

Two decode tiers live here:

* REAL format decodes (no codec needed): spec-compliant PNG headers
  with CRC-32 re-verification, RIFF/WAVE PCM amplitude stats, 24bpp
  BMP pixel sums (stride/orientation/interleave handled), and
  YUV4MPEG2 video frame sampling — planted deterministically JVM-side
  and parsed byte-for-byte in Arrow-batched Python, each hash-checked
  against a closed-form DuckDB oracle.
* The legacy size-formula stub (`_fake_decode_dims`), kept as the
  slot where a codec decode (JPEG/H.264 via PIL/ffmpeg — libs this
  container doesn't ship) would drop in with the same signature.

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


# ---------------------------------------------------------------------------
# Real binary decode: format-valid PNG / WAV blobs planted JVM-side,
# parsed byte-for-byte in Arrow-batched Python.
#
# The container has no media codecs, so full pixel/resample decodes
# stay out of reach — but container FORMAT parsing needs none: the
# blobs below are spec-compliant PNG (signature + IHDR with a true
# CRC-32 + IEND) and RIFF/WAVE (fmt chunk + real int16-LE PCM frames),
# and the decoders genuinely walk chunks, unpack struct fields, verify
# CRCs and aggregate PCM amplitudes with numpy. Planting is
# deterministic (doc_id-derived) so a DuckDB oracle can state the
# expected header fields and PCM statistics in closed form — the
# driver's hash compare then certifies that REAL byte parsing happened
# (any construction/parsing bug breaks signature, CRC, or stats).
# ---------------------------------------------------------------------------

#: planting formulas (shared by the Spark builders and the SQL oracles)
PNG_W = "16 + doc_id % 320"
PNG_H = "16 + doc_id % 240"
WAV_RATES = (8000, 16000, 44100)
#: channel count over the PLANTED (odd) doc_ids: doc_id%4==1 → stereo,
#: doc_id%4==3 → mono — both decode paths exercised every run. Pure
#: modulo arithmetic so the identical text runs in Spark SQL and DuckDB.
WAV_CHANNELS = "(doc_id % 4 + 1) % 3"
#: TOTAL int16 sample count — a multiple of the channel count by
#: construction, so every blob holds whole PCM frames (spec-compliant:
#: data size is a multiple of block_align; no orphan half-frame)
WAV_N_SAMPLES = f"({WAV_CHANNELS}) * (8 + doc_id % 25)"
WAV_SAMPLE = "((doc_id * 31 + i * 17) % 4096) - 2048"


def _hex_be(col, n_bytes: int):
    """Big-endian fixed-width hex of a non-negative int column."""
    return F.lpad(F.hex(col), 2 * n_bytes, "0")


def _hex_le(col, n_bytes: int):
    """Little-endian hex: emit bytes low-to-high."""
    parts = [
        F.lpad(F.hex(F.shiftright(col, 8 * i).bitwiseAND(F.lit(255))), 2, "0")
        for i in range(n_bytes)
    ]
    return F.concat(*parts)


def plant_png_blobs(documents: DataFrame) -> DataFrame:
    """(doc_id, payload, media_kind): a spec-compliant PNG stream —
    8-byte signature, IHDR (8-bit RGBA, doc_id-derived dimensions)
    with its true CRC-32 computed JVM-side (``F.crc32`` over the
    chunk type+data bytes), and IEND. Entirely built-in hex/unhex
    string arithmetic: blob construction runs in whole-stage codegen,
    no Python."""
    w = F.expr(PNG_W).cast("long")
    h = F.expr(PNG_H).cast("long")
    # IHDR data: width(4) height(4) depth=8 color=6(RGBA) comp=0
    # filter=0 interlace=0  →  13 bytes
    ihdr_type_data = F.concat(
        F.lit("49484452"),  # "IHDR"
        _hex_be(w, 4),
        _hex_be(h, 4),
        F.lit("08"),
        F.lit("06"),
        F.lit("000000"),
    )
    ihdr_crc = _hex_be(F.crc32(F.unhex(ihdr_type_data)), 4)
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),  # PNG signature
        F.lit("0000000D"),  # IHDR length = 13
        ihdr_type_data,
        ihdr_crc,
        F.lit("0000000049454E44AE426082"),  # zero-length IEND + its CRC
    )
    return documents.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.unhex(png_hex).alias("payload"),
        F.lit("image/png").alias("media_kind"),
    )


def plant_wav_blobs(documents: DataFrame) -> DataFrame:
    """(doc_id, payload, media_kind): a spec-compliant RIFF/WAVE blob —
    canonical 44-byte header (PCM fmt chunk: doc_id-derived channel
    count, MONO and STEREO both planted via ``WAV_CHANNELS``, and a
    doc_id-derived sample rate) followed by real 16-bit little-endian
    PCM samples from the deterministic ``WAV_SAMPLE`` formula —
    ``WAV_N_SAMPLES`` is a multiple of the channel count, so the data
    chunk holds whole frames (size % block_align == 0). The sample
    array is hex-encoded by a ``transform`` over ``sequence`` (two's
    complement by hand for negatives) — all JVM-side."""
    n_samp = F.expr(WAV_N_SAMPLES).cast("long")
    channels = F.expr(WAV_CHANNELS).cast("long")
    rate = F.element_at(
        F.array(*[F.lit(r) for r in WAV_RATES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    ).cast("long")
    data_size = n_samp * 2
    byte_rate = rate * channels * 2
    block_align = channels * 2
    # int16 LE per sample; negatives as two's complement (v & 0xFFFF).
    # SQL text rather than the Python lambda DSL so the per-sample
    # expression can reference both doc_id and the sequence index —
    # still built-ins, still codegen'd
    sample_hex = F.expr(
        f"""
        array_join(
          transform(sequence(0, cast({WAV_N_SAMPLES} AS INT) - 1),
            i -> concat(
              lpad(hex(({WAV_SAMPLE} & 65535) & 255), 2, '0'),
              lpad(hex((({WAV_SAMPLE} & 65535) >> 8) & 255), 2, '0')
            )),
          '')
        """
    )
    wav_hex = F.concat(
        F.lit("52494646"),  # "RIFF"
        _hex_le(data_size + 36, 4),
        F.lit("57415645"),  # "WAVE"
        F.lit("666D7420"),  # "fmt "
        F.lit("10000000"),  # fmt chunk size 16
        F.lit("0100"),  # PCM
        _hex_le(channels, 2),
        _hex_le(rate, 4),
        _hex_le(byte_rate, 4),
        _hex_le(block_align, 2),
        F.lit("1000"),  # 16 bits/sample
        F.lit("64617461"),  # "data"
        _hex_le(data_size, 4),
        sample_hex,
    )
    return documents.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.unhex(wav_hex).alias("payload"),
        F.lit("audio/wav").alias("media_kind"),
    )


PNG_DECODED_SCHEMA = (
    "doc_id LONG, n_bytes INT, width INT, height INT, "
    "bit_depth INT, color_type INT, crc_ok BOOLEAN"
)


def decode_png_headers(planted: DataFrame) -> DataFrame:
    """REAL PNG parse over Arrow batches: verify the 8-byte signature,
    read the IHDR chunk length/type, unpack big-endian dimensions and
    the depth/color bytes, and recompute the chunk CRC-32 with zlib —
    raising on any malformed blob (corrupt data must fail loudly, not
    produce rows)."""
    import pyarrow as pa

    def _decode(batches):
        import struct
        import zlib

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {
                "doc_id": [], "n_bytes": [], "width": [], "height": [],
                "bit_depth": [], "color_type": [], "crc_ok": [],
            }
            for doc_id, blob in zip(doc_ids, payloads):
                if blob[:8] != b"\x89PNG\r\n\x1a\x0a":
                    raise ValueError(f"doc {doc_id}: not a PNG signature")
                (length,) = struct.unpack(">I", blob[8:12])
                ctype = blob[12:16]
                if ctype != b"IHDR" or length != 13:
                    raise ValueError(f"doc {doc_id}: first chunk not IHDR(13)")
                width, height = struct.unpack(">II", blob[16:24])
                bit_depth, color_type = blob[24], blob[25]
                (crc_stored,) = struct.unpack(">I", blob[29:33])
                crc_ok = zlib.crc32(blob[12:29]) & 0xFFFFFFFF == crc_stored
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(blob))
                out["width"].append(width)
                out["height"].append(height)
                out["bit_depth"].append(bit_depth)
                out["color_type"].append(color_type)
                out["crc_ok"].append(crc_ok)
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()), ("n_bytes", pa.int32()),
                        ("width", pa.int32()), ("height", pa.int32()),
                        ("bit_depth", pa.int32()), ("color_type", pa.int32()),
                        ("crc_ok", pa.bool_()),
                    ]
                ),
            )

    return planted.select("doc_id", "payload").mapInArrow(
        _decode, schema=PNG_DECODED_SCHEMA
    )


WAV_DECODED_SCHEMA = (
    "doc_id LONG, n_channels INT, sample_rate INT, n_samples INT, "
    "duration_us LONG, peak_amp INT, sum_amp LONG"
)


def decode_wav_pcm_stats(planted: DataFrame) -> DataFrame:
    """REAL RIFF/WAVE parse + PCM feature extraction over Arrow
    batches: validate RIFF/WAVE magic, WALK the subchunks (no fixed
    44-byte assumption) to find fmt and data, unpack the PCM format
    fields, then ``np.frombuffer`` the int16-LE samples and reduce
    peak |amplitude| and amplitude sum vectorized. duration_us uses
    integer arithmetic so the oracle matches bit-for-bit."""
    import pyarrow as pa

    def _decode(batches):
        import struct

        import numpy as np

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {
                "doc_id": [], "n_channels": [], "sample_rate": [],
                "n_samples": [], "duration_us": [], "peak_amp": [],
                "sum_amp": [],
            }
            for doc_id, blob in zip(doc_ids, payloads):
                if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
                    raise ValueError(f"doc {doc_id}: not a RIFF/WAVE blob")
                (riff_size,) = struct.unpack("<I", blob[4:8])
                if riff_size != len(blob) - 8:
                    raise ValueError(f"doc {doc_id}: RIFF size mismatch")
                pos, fmt, data = 12, None, None
                while pos + 8 <= len(blob):
                    cid = blob[pos : pos + 4]
                    (csize,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
                    body = blob[pos + 8 : pos + 8 + csize]
                    if cid == b"fmt ":
                        fmt = struct.unpack("<HHIIHH", body[:16])
                    elif cid == b"data":
                        data = body
                    pos += 8 + csize + (csize & 1)  # chunks are word-aligned
                if fmt is None or data is None:
                    raise ValueError(f"doc {doc_id}: missing fmt/data chunk")
                audio_fmt, channels, rate, byte_rate, block_align, bits = fmt
                if audio_fmt != 1 or bits != 16:
                    raise ValueError(f"doc {doc_id}: not 16-bit PCM")
                if byte_rate != rate * channels * 2 or block_align != channels * 2:
                    raise ValueError(f"doc {doc_id}: inconsistent fmt fields")
                samples = np.frombuffer(data, dtype="<i2")
                n_samples = len(samples)
                duration_us = (n_samples // channels) * 1_000_000 // rate
                out["doc_id"].append(doc_id)
                out["n_channels"].append(channels)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n_samples)
                out["duration_us"].append(duration_us)
                out["peak_amp"].append(int(np.abs(samples.astype(np.int32)).max()))
                out["sum_amp"].append(int(samples.astype(np.int64).sum()))
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()), ("n_channels", pa.int32()),
                        ("sample_rate", pa.int32()), ("n_samples", pa.int32()),
                        ("duration_us", pa.int64()), ("peak_amp", pa.int32()),
                        ("sum_amp", pa.int64()),
                    ]
                ),
            )

    return planted.select("doc_id", "payload").mapInArrow(
        _decode, schema=WAV_DECODED_SCHEMA
    )


#: BMP planting formulas (24bpp; width 1-4 exercises every stride-pad
#: case 1/2/3/0, height 1-3 exercises the bottom-up row order).
#: ``{i}`` is the logical pixel index y*w+x — substituted with the
#: lambda variable in each engine's text (a bare ``i`` would collide
#: with the ``i`` inside ``doc_id`` under string substitution).
BMP_W = "1 + doc_id % 4"
BMP_H = "1 + doc_id % 3"
BMP_B = "(doc_id + 3 * {i}) % 256"
BMP_G = "(doc_id * 2 + 3 * {i} + 1) % 256"
BMP_R = "(doc_id * 3 + 3 * {i} + 2) % 256"


#: even-dimension planting formulas for the resize path (a 2×2 box
#: filter needs both axes divisible by 2); widths 2/4/6/8 still hit
#: both nonzero stride-pad cases (w*3 % 4 = 2 and 0)
BMP_RS_W = "2 * (1 + doc_id % 4)"
BMP_RS_H = "2 + 2 * (doc_id % 3)"


def plant_bmp_blobs(
    documents: DataFrame, w_expr: str = BMP_W, h_expr: str = BMP_H
) -> DataFrame:
    """(doc_id, payload, media_kind): a spec-compliant 24bpp BMP —
    BITMAPFILEHEADER + BITMAPINFOHEADER + REAL pixel data stored the
    way BMP stores it: bottom-up row order, BGR byte order, each row
    zero-padded to a 4-byte boundary. Pixel channel values follow the
    deterministic ``BMP_B/G/R`` formulas over the logical pixel index
    i = y*w + x. All hex/unhex built-ins (nested transform lambdas),
    whole-stage codegen, no Python. ``w_expr``/``h_expr`` pick the
    dimension formulas (default geometry exercises every stride pad;
    ``BMP_RS_W/H`` give the even dims the resize path needs)."""
    w = F.expr(w_expr).cast("long")
    h = F.expr(h_expr).cast("long")
    pad = (4 - (w * 3) % 4) % 4
    stride = w * 3 + pad
    px_idx = f"(y * ({w_expr}) + x)"
    pixel_hex = F.expr(
        f"""
        array_join(transform(sequence(cast({h_expr} AS INT) - 1, 0, -1), y ->
          concat(
            array_join(transform(sequence(0, cast({w_expr} AS INT) - 1), x ->
              concat(
                lpad(hex({BMP_B.format(i=px_idx)}), 2, '0'),
                lpad(hex({BMP_G.format(i=px_idx)}), 2, '0'),
                lpad(hex({BMP_R.format(i=px_idx)}), 2, '0')
              )), ''),
            repeat('00', cast((4 - (({w_expr}) * 3) % 4) % 4 AS INT))
          )), '')
        """
    )
    bmp_hex = F.concat(
        F.lit("424D"),  # "BM"
        _hex_le(stride * h + 54, 4),  # file size
        F.lit("00000000"),  # reserved
        F.lit("36000000"),  # pixel data offset = 54
        F.lit("28000000"),  # BITMAPINFOHEADER size = 40
        _hex_le(w, 4),
        _hex_le(h, 4),  # positive height = bottom-up
        F.lit("0100"),  # planes
        F.lit("1800"),  # 24 bpp
        F.lit("00000000"),  # BI_RGB (uncompressed)
        _hex_le(stride * h, 4),  # image size
        F.lit("130B0000130B0000"),  # 72 dpi x/y
        F.lit("0000000000000000"),  # palette counts
        pixel_hex,
    )
    return documents.select(
        "doc_id",
        F.unhex(bmp_hex).alias("payload"),
        F.lit("image/bmp").alias("media_kind"),
    )


BMP_DECODED_SCHEMA = (
    "doc_id LONG, width INT, height INT, n_pixels INT, "
    "sum_b LONG, sum_g LONG, sum_r LONG"
)


def decode_bmp_pixel_stats(planted: DataFrame) -> DataFrame:
    """REAL pixel-level decode over Arrow batches: validate the BM
    magic / offset / 24bpp / BI_RGB fields, then reconstruct the pixel
    array with numpy — reshape by the 4-byte-aligned stride, strip the
    row padding, split the BGR interleave — and reduce per-channel
    amplitude sums. Getting these sums right REQUIRES handling stride
    padding correctly (widths 1-3 have 1-3 pad bytes per row): a
    decoder that naively reads the pixel area flat produces wrong
    sums, which the closed-form oracle catches."""
    import pyarrow as pa

    def _decode(batches):
        import struct

        import numpy as np

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [],
                "sum_b": [], "sum_g": [], "sum_r": [],
            }
            for doc_id, blob in zip(doc_ids, payloads):
                if blob[:2] != b"BM":
                    raise ValueError(f"doc {doc_id}: not a BMP")
                file_size, _, offset = struct.unpack("<III", blob[2:14])
                if file_size != len(blob):
                    raise ValueError(f"doc {doc_id}: file size mismatch")
                hdr_size, width, height = struct.unpack("<Iii", blob[14:26])
                planes, bpp, compression = struct.unpack("<HHI", blob[26:34])
                if hdr_size != 40 or planes != 1 or bpp != 24 or compression != 0:
                    raise ValueError(f"doc {doc_id}: not an uncompressed 24bpp BMP")
                stride = (width * 3 + 3) // 4 * 4
                px = np.frombuffer(
                    blob[offset : offset + stride * height], dtype=np.uint8
                ).reshape(height, stride)[:, : width * 3]
                bgr = px.reshape(height * width, 3).astype(np.int64)
                out["doc_id"].append(doc_id)
                out["width"].append(width)
                out["height"].append(height)
                out["n_pixels"].append(width * height)
                out["sum_b"].append(int(bgr[:, 0].sum()))
                out["sum_g"].append(int(bgr[:, 1].sum()))
                out["sum_r"].append(int(bgr[:, 2].sum()))
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()), ("width", pa.int32()),
                        ("height", pa.int32()), ("n_pixels", pa.int32()),
                        ("sum_b", pa.int64()), ("sum_g", pa.int64()),
                        ("sum_r", pa.int64()),
                    ]
                ),
            )

    return planted.select("doc_id", "payload").mapInArrow(
        _decode, schema=BMP_DECODED_SCHEMA
    )


BMP_HEADER_SCHEMA = (
    "doc_id LONG, n_bytes INT, data_offset INT, width INT, height INT, "
    "bpp INT, stride INT, img_bytes INT"
)


def decode_bmp_headers(planted: DataFrame) -> DataFrame:
    """REAL header decode over PANDAS batches (mapInPandas — the
    pandas-batch leg of the Arrow plumbing, where the other decoders
    ride mapInArrow): validate the BM magic, little-endian unpack the
    BITMAPFILEHEADER + BITMAPINFOHEADER, and CROSS-CHECK every
    derivable field against the blob itself — the declared file size
    against len(blob), the declared image size against the
    stride-aligned pixel area. The emitted fields are all header
    bytes, so the closed-form oracle certifies genuine little-endian
    struct parsing (PNG covers the big-endian case)."""
    import pandas as pd

    def _decode(batches):
        import struct

        for pdf in batches:
            out = {
                "doc_id": [], "n_bytes": [], "data_offset": [], "width": [],
                "height": [], "bpp": [], "stride": [], "img_bytes": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(blob)
                if blob[:2] != b"BM":
                    raise ValueError(f"doc {doc_id}: not a BMP")
                file_size, _, offset = struct.unpack("<III", blob[2:14])
                if file_size != len(blob):
                    raise ValueError(f"doc {doc_id}: file size mismatch")
                hdr_size, width, height = struct.unpack("<Iii", blob[14:26])
                planes, bpp, compression = struct.unpack("<HHI", blob[26:34])
                (img_bytes,) = struct.unpack("<I", blob[34:38])
                if hdr_size != 40 or planes != 1 or compression != 0:
                    raise ValueError(f"doc {doc_id}: unexpected BIH")
                stride = (width * bpp // 8 + 3) // 4 * 4
                if img_bytes != stride * height:
                    raise ValueError(f"doc {doc_id}: image size mismatch")
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(file_size)
                out["data_offset"].append(offset)
                out["width"].append(width)
                out["height"].append(height)
                out["bpp"].append(bpp)
                out["stride"].append(stride)
                out["img_bytes"].append(img_bytes)
            yield pd.DataFrame(out)

    return planted.select("doc_id", "payload").mapInPandas(
        _decode, schema=BMP_HEADER_SCHEMA
    )


BMP_RESIZE_SCHEMA = (
    "doc_id LONG, width INT, height INT, resized_w INT, resized_h INT, "
    "rs_sum_b LONG, rs_sum_g LONG, rs_sum_r LONG, rs_b00 INT"
)


def decode_bmp_resize_box(planted: DataFrame) -> DataFrame:
    """REAL resize over decoded pixels: decode the 24bpp pixel area
    (stride strip + bottom-up flip into logical top-down order), then
    2× downsample with an integer 2×2 BOX FILTER — each output pixel
    is the floor-average of its four source pixels, the exact
    arithmetic a production thumbnail/model-input resize does before
    normalization. Emits per-channel amplitude sums of the RESIZED
    image plus the resized top-left blue value ``rs_b00``: the sums
    verify stride/interleave and the filter arithmetic; ``rs_b00``
    is orientation-SENSITIVE, so a decoder that forgets the
    bottom-up flip fails the compare even though channel sums are
    flip-invariant."""
    import pyarrow as pa

    def _decode(batches):
        import struct

        import numpy as np

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {
                "doc_id": [], "width": [], "height": [], "resized_w": [],
                "resized_h": [], "rs_sum_b": [], "rs_sum_g": [],
                "rs_sum_r": [], "rs_b00": [],
            }
            for doc_id, blob in zip(doc_ids, payloads):
                if blob[:2] != b"BM":
                    raise ValueError(f"doc {doc_id}: not a BMP")
                (offset,) = struct.unpack("<I", blob[10:14])
                _, width, height = struct.unpack("<Iii", blob[14:26])
                if width % 2 or height % 2:
                    raise ValueError(
                        f"doc {doc_id}: box resize needs even dims, "
                        f"got {width}x{height}"
                    )
                stride = (width * 3 + 3) // 4 * 4
                px = np.frombuffer(
                    blob[offset : offset + stride * height], dtype=np.uint8
                ).reshape(height, stride)[:, : width * 3]
                # stored bottom-up -> flip to logical top-down BEFORE
                # block-grouping (for height > 2 the top-left block
                # covers different source rows in each order, so
                # rs_b00 catches a missing flip)
                img = px.reshape(height, width, 3)[::-1].astype(np.int64)
                rh, rw = height // 2, width // 2
                blocks = img.reshape(rh, 2, rw, 2, 3).sum(axis=(1, 3)) // 4
                sums = blocks.sum(axis=(0, 1))
                out["doc_id"].append(doc_id)
                out["width"].append(width)
                out["height"].append(height)
                out["resized_w"].append(rw)
                out["resized_h"].append(rh)
                out["rs_sum_b"].append(int(sums[0]))
                out["rs_sum_g"].append(int(sums[1]))
                out["rs_sum_r"].append(int(sums[2]))
                out["rs_b00"].append(int(blocks[0, 0, 0]))
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()), ("width", pa.int32()),
                        ("height", pa.int32()), ("resized_w", pa.int32()),
                        ("resized_h", pa.int32()), ("rs_sum_b", pa.int64()),
                        ("rs_sum_g", pa.int64()), ("rs_sum_r", pa.int64()),
                        ("rs_b00", pa.int32()),
                    ]
                ),
            )

    return planted.select("doc_id", "payload").mapInArrow(
        _decode, schema=BMP_RESIZE_SCHEMA
    )


#: Y4M (YUV4MPEG2) planting formulas — a REAL uncompressed video
#: container (mjpegtools/ffmpeg interchange format): text stream
#: header, then per frame a "FRAME\n" marker + raw planar YUV 4:2:0
#: bytes. Dimensions stay even (4:2:0 subsampling halves each axis
#: for the chroma planes). ``{f}`` = frame index, ``{j}`` = byte index
#: within the plane.
Y4M_W = "2 + 2 * (doc_id % 2)"
Y4M_H = "2 + 2 * (doc_id % 3)"
Y4M_N_FRAMES = "1 + doc_id % 5"
Y4M_Y = "(doc_id + 7 * {f} + 3 * {j}) % 256"
Y4M_U = "(doc_id * 2 + 5 * {f} + {j}) % 256"
Y4M_V = "(doc_id * 3 + 11 * {f} + {j}) % 256"


def plant_y4m_blobs(documents: DataFrame) -> DataFrame:
    """(doc_id, payload, media_kind): a spec-compliant YUV4MPEG2
    stream — ASCII header ``YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 C420``,
    then ``1 + doc_id % 5`` frames, each a ``FRAME\\n`` marker followed
    by w·h luma + 2·(w/2)·(h/2) chroma bytes from the deterministic
    plane formulas. Header built as hex-of-utf8, planes as nested
    transform lambdas — all JVM-side built-ins."""
    header_hex = F.hex(
        F.encode(
            F.concat(
                F.lit("YUV4MPEG2 W"),
                F.expr(Y4M_W).cast("string"),
                F.lit(" H"),
                F.expr(Y4M_H).cast("string"),
                F.lit(" F25:1 Ip A1:1 C420\n"),
            ),
            "UTF-8",
        )
    )
    plane = (
        "array_join(transform(sequence(0, cast({n} AS INT) - 1), "
        "j -> lpad(hex({fml}), 2, '0')), '')"
    )
    y_plane = plane.format(
        n=f"({Y4M_W}) * ({Y4M_H})", fml=Y4M_Y.format(f="f", j="j")
    )
    u_plane = plane.format(
        n=f"(({Y4M_W}) DIV 2) * (({Y4M_H}) DIV 2)", fml=Y4M_U.format(f="f", j="j")
    )
    v_plane = plane.format(
        n=f"(({Y4M_W}) DIV 2) * (({Y4M_H}) DIV 2)", fml=Y4M_V.format(f="f", j="j")
    )
    frames_hex = F.expr(
        f"""
        array_join(transform(sequence(0, cast({Y4M_N_FRAMES} AS INT) - 1), f ->
          concat('4652414D450A', {y_plane}, {u_plane}, {v_plane})), '')
        """
    )
    return documents.select(
        "doc_id",
        F.unhex(F.concat(header_hex, frames_hex)).alias("payload"),
        F.lit("video/x-yuv4mpeg").alias("media_kind"),
    )


Y4M_DECODED_SCHEMA = (
    "doc_id LONG, width INT, height INT, n_frames INT, "
    "frame_idx INT, sum_y LONG, sum_u LONG, sum_v LONG"
)


def decode_y4m_frame_stats(planted: DataFrame, sample_every: int = 2) -> DataFrame:
    """REAL video container decode + frame sampling over Arrow
    batches: parse the YUV4MPEG2 text header (W/H/C tokens), then walk
    the FRAME markers — decoding the planar YUV bytes ONLY for sampled
    frames (every ``sample_every``-th) and seeking past the rest,
    which is the production frame-sampling contract: unsampled frames
    cost a pointer bump, not a decode. One output row per sampled
    frame with per-plane amplitude sums (integer-exact)."""
    import pyarrow as pa

    def _decode(batches):
        import re

        import numpy as np

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {
                "doc_id": [], "width": [], "height": [], "n_frames": [],
                "frame_idx": [], "sum_y": [], "sum_u": [], "sum_v": [],
            }
            for doc_id, blob in zip(doc_ids, payloads):
                nl = blob.index(b"\n")
                header = blob[:nl].decode("ascii")
                if not header.startswith("YUV4MPEG2"):
                    raise ValueError(f"doc {doc_id}: not a YUV4MPEG2 stream")
                mw = re.search(r" W(\d+)", header)
                mh = re.search(r" H(\d+)", header)
                mc = re.search(r" C(\S+)", header)
                if not mw or not mh:
                    raise ValueError(f"doc {doc_id}: missing W/H tokens")
                if mc and mc.group(1) != "420":
                    raise ValueError(f"doc {doc_id}: unsupported colorspace")
                w, h = int(mw.group(1)), int(mh.group(1))
                y_size, c_size = w * h, (w // 2) * (h // 2)
                frame_size = y_size + 2 * c_size
                pos, frames = nl + 1, []
                while pos < len(blob):
                    fnl = blob.index(b"\n", pos)
                    if blob[pos:fnl].split(b" ")[0] != b"FRAME":
                        raise ValueError(f"doc {doc_id}: bad FRAME marker")
                    frames.append(fnl + 1)
                    pos = fnl + 1 + frame_size
                if pos != len(blob):
                    raise ValueError(f"doc {doc_id}: trailing bytes after last frame")
                for f, start in enumerate(frames):
                    if f % sample_every != 0:
                        continue  # seek past: no decode for unsampled frames
                    raw = np.frombuffer(
                        blob[start : start + frame_size], dtype=np.uint8
                    ).astype(np.int64)
                    out["doc_id"].append(doc_id)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(len(frames))
                    out["frame_idx"].append(f)
                    out["sum_y"].append(int(raw[:y_size].sum()))
                    out["sum_u"].append(int(raw[y_size : y_size + c_size].sum()))
                    out["sum_v"].append(int(raw[y_size + c_size :].sum()))
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()), ("width", pa.int32()),
                        ("height", pa.int32()), ("n_frames", pa.int32()),
                        ("frame_idx", pa.int32()), ("sum_y", pa.int64()),
                        ("sum_u", pa.int64()), ("sum_v", pa.int64()),
                    ]
                ),
            )

    return planted.select("doc_id", "payload").mapInArrow(
        _decode, schema=Y4M_DECODED_SCHEMA
    )


PHASH_SCHEMA = "doc_id LONG, width INT, height INT, phash LONG"


def decode_bmp_phash(planted: DataFrame) -> DataFrame:
    """Perceptual hash from DECODED pixels: reconstruct the logical
    top-down pixel grid (undo BMP's bottom-up storage + stride pad +
    BGR interleave), take integer BT.601 luma per pixel, and set bit i
    when pixel i's luma strictly exceeds the image mean (compared as
    ``luma*n > total`` so the threshold stays integer-exact). The
    resulting average-hash is what image-dedup pipelines group on —
    tiny planted images stand in for the 8×8 downsample of a real
    aHash, so the bit layout (logical scan order) is the contract the
    oracle checks."""
    import pyarrow as pa

    def _decode(batches):
        import struct

        import numpy as np

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {"doc_id": [], "width": [], "height": [], "phash": []}
            for doc_id, blob in zip(doc_ids, payloads):
                if blob[:2] != b"BM":
                    raise ValueError(f"doc {doc_id}: not a BMP")
                (offset,) = struct.unpack("<I", blob[10:14])
                _, width, height = struct.unpack("<Iii", blob[14:26])
                stride = (width * 3 + 3) // 4 * 4
                rows = np.frombuffer(
                    blob[offset : offset + stride * height], dtype=np.uint8
                ).reshape(height, stride)[:, : width * 3]
                # file rows are bottom-up; flip to logical top-down
                bgr = rows[::-1].reshape(height * width, 3).astype(np.int64)
                luma = (299 * bgr[:, 2] + 587 * bgr[:, 1] + 114 * bgr[:, 0]) // 1000
                n = luma.size
                # int64 shifts >= 64 are undefined in numpy and overflow
                # differently in DuckDB's `1::BIGINT << i`; cap hard so a
                # larger planted blob fails loudly instead of silently
                # diverging between engines (the oracle carries the same
                # <= 63-bit contract).
                if n > 63:
                    raise ValueError(
                        f"doc {doc_id}: {n}px aHash exceeds the 63-bit "
                        "fingerprint contract"
                    )
                total = int(luma.sum())
                bits = luma * n > total
                phash = int(
                    (bits.astype(np.int64) << np.arange(n, dtype=np.int64)).sum()
                )
                out["doc_id"].append(doc_id)
                out["width"].append(width)
                out["height"].append(height)
                out["phash"].append(phash)
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()), ("width", pa.int32()),
                        ("height", pa.int32()), ("phash", pa.int64()),
                    ]
                ),
            )

    return planted.select("doc_id", "payload").mapInArrow(
        _decode, schema=PHASH_SCHEMA
    )


AFP_WINDOW = 4  #: samples per energy window for the audio fingerprint
AFP_SCHEMA = "doc_id LONG, n_windows INT, afp LONG"


def decode_wav_energy_fingerprint(planted: DataFrame) -> DataFrame:
    """Audio fingerprint from DECODED PCM: parse the RIFF/WAVE layout,
    square-sum each {AFP_WINDOW}-sample window's int16 amplitudes
    (integer-exact energies), and set bit j when window j+1 is louder
    than window j — the energy-delta sign pattern that audio-dedup
    pipelines bucket on (a Shazam-style envelope hash without the
    FFT this container can't ship). Tail samples short of a full
    window are dropped, which the oracle reproduces."""
    import pyarrow as pa

    def _decode(batches):
        import struct

        import numpy as np

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {"doc_id": [], "n_windows": [], "afp": []}
            for doc_id, blob in zip(doc_ids, payloads):
                if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
                    raise ValueError(f"doc {doc_id}: not a RIFF/WAVE blob")
                if blob[36:40] != b"data":
                    raise ValueError(f"doc {doc_id}: canonical data chunk missing")
                (data_size,) = struct.unpack("<I", blob[40:44])
                pcm = np.frombuffer(
                    blob[44 : 44 + data_size], dtype="<i2"
                ).astype(np.int64)
                n_win = pcm.size // AFP_WINDOW
                energy = (
                    (pcm[: n_win * AFP_WINDOW] ** 2)
                    .reshape(n_win, AFP_WINDOW)
                    .sum(axis=1)
                )
                bits = energy[1:] > energy[:-1]
                # same 63-bit cap as the BMP aHash: numpy/DuckDB int64
                # shift semantics diverge at bit 64+, so fail loudly.
                if bits.size > 63:
                    raise ValueError(
                        f"doc {doc_id}: {bits.size} energy transitions exceed "
                        "the 63-bit fingerprint contract"
                    )
                afp = int(
                    (bits.astype(np.int64) << np.arange(bits.size, dtype=np.int64)).sum()
                )
                out["doc_id"].append(doc_id)
                out["n_windows"].append(n_win)
                out["afp"].append(afp)
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()),
                        ("n_windows", pa.int32()),
                        ("afp", pa.int64()),
                    ]
                ),
            )

    return planted.select("doc_id", "payload").mapInArrow(
        _decode, schema=AFP_SCHEMA
    )


# ---------------------------------------------------------------------------
# TAR (WebDataset-style) shard decode: the standard packaging for
# large multimodal training corpora — each sample is a GROUP of
# same-stem members inside a POSIX ustar archive. Planting builds a
# real spec-compliant tar per document (3 members: payload text,
# JSON metadata, language tag); decoding walks the 512-byte block
# structure, re-verifies each header's octal checksum, and emits per
# member the parsed name/size plus an md5 content digest the DuckDB
# oracle can recompute from the source columns.
# ---------------------------------------------------------------------------

TAR_DECODED_SCHEMA = (
    "doc_id LONG, member_name STRING, member_size LONG, content_md5 STRING"
)


def plant_tar_blobs(documents: DataFrame) -> DataFrame:
    """(doc_id, payload, media_kind) — a ustar archive per document,
    built with the stdlib encoder over Arrow batches (planting is
    test scaffolding; the DECODER below is the operator under test).
    Members: ``{doc_id}.txt`` (the document text), ``{doc_id}.json``
    (metadata), ``{doc_id}.lang`` (language tag) — the same-stem
    member grouping WebDataset samples use."""
    import io
    import tarfile

    import pyarrow as pa

    def _plant(batches):
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            langs = batch.column("lang").to_pylist()
            payloads = []
            for doc_id, text, lang in zip(doc_ids, texts, langs):
                buf = io.BytesIO()
                # GNU_FORMAT defaults vary by python version; pin ustar
                with tarfile.open(
                    fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
                ) as tf:
                    # WebDataset members are OPTIONAL per sample: a
                    # missing (NULL) field has no member at all — it
                    # does not serialize as an empty or sentinel file
                    members = [
                        (f"{doc_id}.txt", text),
                        (f"{doc_id}.json", f'{{"doc_id": {doc_id}}}'),
                        (f"{doc_id}.lang", lang),
                    ]
                    for name, payload in members:
                        if payload is None:
                            continue
                        data = payload.encode("utf-8")
                        info = tarfile.TarInfo(name=name)
                        info.size = len(data)
                        info.mtime = 0  # determinism: no wall clock
                        tf.addfile(info, io.BytesIO(data))
                payloads.append(buf.getvalue())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids, type=pa.int64()),
                    pa.array(payloads, type=pa.binary()),
                    pa.array(
                        ["application/x-tar"] * len(doc_ids), type=pa.string()
                    ),
                ],
                names=["doc_id", "payload", "media_kind"],
            )

    return documents.select("doc_id", "text", "lang").mapInArrow(
        _plant, schema="doc_id LONG, payload BINARY, media_kind STRING"
    )


def decode_tar_members(planted: DataFrame) -> DataFrame:
    """REAL ustar walk — no tarfile on the decode side: parse each
    512-byte header (name, octal size, octal checksum), RE-VERIFY the
    checksum (unsigned sum of the header with the checksum field
    blanked), slice the member data, and seek past the 512-padding to
    the next header. One output row per member with an md5 content
    digest. Malformed headers raise — a corrupt shard must fail
    loudly, not yield silently-wrong samples.

    Scale: shards stream through ``mapInArrow`` one Arrow batch at a
    time; the walk is pointer arithmetic per member (data is sliced,
    never copied member-by-member into Python objects), which is the
    WebDataset read pattern: sequential scan, no random access, so a
    100 TB corpus reads at storage bandwidth."""
    import hashlib

    import pyarrow as pa

    def _decode(batches):
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {
                "doc_id": [], "member_name": [],
                "member_size": [], "content_md5": [],
            }
            for doc_id, blob in zip(doc_ids, payloads):
                pos = 0
                while pos + 512 <= len(blob):
                    header = blob[pos : pos + 512]
                    if header == b"\x00" * 512:
                        break  # end-of-archive marker
                    # checksum FIRST, over the raw header — field
                    # parsing (utf-8 name, octal size) must only run
                    # on a header proven intact
                    stated = int(
                        header[148:156].split(b"\x00", 1)[0].strip() or b"0", 8
                    )
                    blanked = header[:148] + b" " * 8 + header[156:]
                    if sum(blanked) != stated:
                        raise ValueError(
                            f"doc {doc_id}: tar header checksum mismatch "
                            f"at offset {pos}"
                        )
                    name = header[0:100].split(b"\x00", 1)[0].decode("utf-8")
                    size = int(header[124:136].split(b"\x00", 1)[0] or b"0", 8)
                    data = blob[pos + 512 : pos + 512 + size]
                    out["doc_id"].append(doc_id)
                    out["member_name"].append(name)
                    out["member_size"].append(size)
                    out["content_md5"].append(hashlib.md5(data).hexdigest())
                    pos += 512 + ((size + 511) // 512) * 512
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()),
                        ("member_name", pa.string()),
                        ("member_size", pa.int64()),
                        ("content_md5", pa.string()),
                    ]
                ),
            )

    return planted.select("doc_id", "payload").mapInArrow(
        _decode, schema=TAR_DECODED_SCHEMA
    )
