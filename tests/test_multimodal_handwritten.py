"""Hand-written blobs for the real media decoders — a SECOND encoder
per format, independent of the ``plant_*`` expressions whose geometry
the DuckDB oracles restate, so a mirrored plant/oracle bug cannot
cancel. Each test also drives a code path the planted corpora never
reach: PNG with ancillary-chunk-style dims outside the planting
range, WAV with an odd-sized LIST chunk BEFORE fmt (word-alignment +
chunk-walk), Y4M with parameterized FRAME headers, TAR with a
directory-style long member path.
"""

from __future__ import annotations

import hashlib
import io
import struct
import tarfile
import zlib

import pytest

from oracle_to_cassandra_spark.operators import multimodal as M


def _df(spark, blob: bytes):
    return spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, payload binary"
    )


def _hand_png(width: int, height: int, bit_depth: int, color_type: int) -> bytes:
    ihdr = struct.pack(">II", width, height) + bytes(
        [bit_depth, color_type, 0, 0, 0]
    )
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\x0a"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def test_png_header_decode_on_handwritten_blob(spark):
    row = M.decode_png_headers(_df(spark, _hand_png(1920, 1080, 16, 6))).collect()[0]
    assert (row.width, row.height) == (1920, 1080)
    assert (row.bit_depth, row.color_type) == (16, 6)
    assert row.crc_ok is True


def test_png_crc_flips_on_single_bit(spark):
    blob = bytearray(_hand_png(8, 8, 8, 2))
    blob[17] ^= 0x01  # inside the IHDR width field
    row = M.decode_png_headers(_df(spark, bytes(blob))).collect()[0]
    assert row.crc_ok is False


def _hand_wav(samples: list[int], rate: int, channels: int) -> bytes:
    """RIFF with an odd-sized LIST chunk BEFORE fmt: the walker must
    skip it via the word-alignment rule (csize + csize&1) to find fmt
    at a non-12 offset — planted WAVs are always fmt-first/even."""
    info = b"INFOx"  # 5 bytes: odd csize forces a pad byte
    data = struct.pack(f"<{len(samples)}h", *samples)
    body = (
        b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body


def test_wav_walker_skips_odd_list_chunk(spark):
    samples = [100, -200, 300, -32768]  # 2 frames of 2 channels
    row = M.decode_wav_pcm_stats(
        _df(spark, _hand_wav(samples, rate=8000, channels=2))
    ).collect()[0]
    assert (row.n_channels, row.sample_rate) == (2, 8000)
    assert row.n_samples == 4
    assert row.duration_us == 2 * 1_000_000 // 8000
    assert row.peak_amp == 32768
    assert row.sum_amp == sum(samples)


def test_wav_mono_frame_math(spark):
    # mono path: n_samples == frames, duration from the full count —
    # the channel-division arithmetic the stereo test can't pin
    samples = [7, -7, 32767]
    row = M.decode_wav_pcm_stats(
        _df(spark, _hand_wav(samples, rate=16000, channels=1))
    ).collect()[0]
    assert (row.n_channels, row.n_samples) == (1, 3)
    assert row.duration_us == 3 * 1_000_000 // 16000
    assert (row.peak_amp, row.sum_amp) == (32767, 32767)


def _hand_y4m(w: int, h: int, frames: list[bytes], params: bool) -> bytes:
    head = f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode()
    marker = b"FRAME Ixyz\n" if params else b"FRAME\n"
    return head + b"".join(marker + f for f in frames)


def test_y4m_param_frame_markers_and_sampling(spark):
    w, h = 2, 2
    fsize = w * h + 2 * ((w // 2) * (h // 2))  # 6 bytes per frame
    frames = [bytes([i] * fsize) for i in (10, 20, 30)]
    rows = (
        M.decode_y4m_frame_stats(
            _df(spark, _hand_y4m(w, h, frames, params=True)), sample_every=2
        )
        .orderBy("frame_idx")
        .collect()
    )
    # frames 0 and 2 sampled; frame 1 seeked past without decode
    assert [r.frame_idx for r in rows] == [0, 2]
    assert all(r.n_frames == 3 for r in rows)
    assert [(r.sum_y, r.sum_u, r.sum_v) for r in rows] == [
        (40, 10, 10),
        (120, 30, 30),
    ]


def test_y4m_rejects_frame_size_lie(spark):
    w, h = 2, 2
    blob = _hand_y4m(w, h, [b"\x01" * 5], params=False)  # 1 byte short
    with pytest.raises(Exception, match="bad FRAME marker|trailing"):
        M.decode_y4m_frame_stats(_df(spark, blob), sample_every=1).count()


def test_tar_walk_matches_stdlib_roundtrip(spark):
    buf = io.BytesIO()
    members = [
        ("shard/0001.txt", b"hello world"),
        ("shard/0001.json", b'{"k": 1}'),
        ("shard/0001.bin", bytes(range(256)) * 3),
    ]
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    rows = M.decode_tar_members(_df(spark, buf.getvalue())).orderBy(
        "member_name"
    ).collect()
    expect = sorted(
        (n, len(d), hashlib.md5(d).hexdigest()) for n, d in members
    )
    assert [(r.member_name, r.member_size, r.content_md5) for r in rows] == expect
